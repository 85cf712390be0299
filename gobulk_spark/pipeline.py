"""The pipeline driver: scan → parse → plan/store, checkpointed.

gobulk's whole runtime (Run/Runner/Listener/Reader/Parser/Planner/
Executor, runner.go:90-226) collapses to this one linear DataFrame
program; the preserved *logical* boundaries are the phase commits
(SURVEY §3.1). Each phase stages its output to parquet and then flips a
checkpoint manifest — on resume, committed phases are skipped and their
staged output re-read (gobulk TestSimpleRunWithMarker semantics).

Phase map (gobulk step.go:6-19 → here):
  listener/reader → 'scan'  : source scan, marker anti-join, hash dedup
  parser          → 'parse' : salted repartition + mapInPandas features
  planner/executor→ 'store' : JVM rule chain, kept/audit/metrics writes

Scale design notes are inline; the short version: the binary column is
pruned or consumed everywhere before any shuffle, the only wide shuffle
is the salted repartition feeding the Python stage (deliberate: it
rebalances skewed phash buckets across executors ahead of the expensive
UDF), and every audit/metrics write is a narrow append.
"""

from __future__ import annotations

import os
import time
from dataclasses import asdict

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from . import deploy, executor, lineage
from .config import PipelineConfig
from .plan import decision_columns
from .sinks import KeptSink, ParquetKeptSink
from .sources import scan as src_scan
from .stages import PARSE_OUTPUT_SCHEMA, make_parse_stage

KEPT_COLUMNS = (
    "image_id",
    "source_file",
    "content_hash",
    "w",
    "h",
    "fmt",
    "phash",
    "caption",
    "lang",
    "lang_conf",
    "ppl",
)


def _salted_repartition(df: DataFrame, cfg: PipelineConfig, n_partitions: int) -> DataFrame:
    """Spread hot phash buckets before the expensive Python stage.

    Deterministic salt from image_id (not rand()) so retried tasks
    produce identical partitioning — gobulk's stable re-sort concern
    (parser.go:92-94) solved by keying instead of ordering.
    """
    bucket = F.pmod(F.col("phash"), F.lit(cfg.phash_buckets))
    salt = F.pmod(F.abs(F.xxhash64("image_id")), F.lit(cfg.salt_buckets))
    return df.repartition(n_partitions, bucket, salt)


def run_pipeline(
    spark: SparkSession, cfg: PipelineConfig, sink: KeptSink | None = None
) -> dict:
    """Execute (or resume) one run. Returns a summary dict.

    ``sink`` is the kept-store backend (gobulk Output seam,
    output.go:12-16); default is the parquet-directory sink. Audit,
    metrics and checkpoints stay in lineage — they are the Tracker,
    not the Output."""
    t_start = time.time()
    out, rid = cfg.out_dir, cfg.run_id
    sink = sink if sink is not None else ParquetKeptSink(out)
    deploy.ship(spark)  # executors must import this package (any cwd)
    summary: dict = {"run_id": rid, "phases": {}, "config": {k: str(v) for k, v in asdict(cfg).items()}}

    def _pause_check(phase: str) -> dict | None:
        """Cooperative pause at phase boundaries (gobulk switcher,
        C3): checked only when the phase has uncommitted work, so a
        paused run reports exactly the phases that DID complete;
        committed phases stay committed and a later run resumes."""
        if lineage.pause_requested(out, spark):
            summary["status"] = "paused"
            summary["paused_before"] = phase
            summary["wall_s"] = time.time() - t_start
            return summary
        return None

    # ---------------- phase: scan (discover, marker, dedup) ----------------
    dups_path = lineage.stage_dir(out, rid, "dups")
    ck = cfg.resume and lineage.phase_committed(out, rid, "scan")
    if not ck:
        if (p := _pause_check("scan")) is not None:
            return p
        t0 = time.time()
        src = src_scan.with_content_hash(src_scan.read_source(spark, cfg.source_path))
        if cfg.incremental:
            # marker keys on the LATEST content_hash per id: a
            # re-scanned id with NEW (or reverted) content passes the
            # anti-join and re-enters as an update/delete (gobulk
            # tracker/gorm.go:441-449 re-tracks per iteration). Exclude
            # THIS run from the marker: a retried scan must see the same
            # input as the first attempt, not be masked by its own
            # half-committed audit (idempotency under crash-retry).
            marker = lineage.processed_keys(spark, out, exclude_run_id=rid)
            if marker is not None:
                src = src.join(marker, ["image_id", "content_hash"], "left_anti")
        # narrow-projection dedup: Catalyst prunes the scan to 3 columns;
        # source_file rides along so the audit needs no join back
        src_scan.find_duplicates(src, carry=("source_file",)).write.mode(
            "overwrite"
        ).parquet(dups_path)
        dups = spark.read.parquet(dups_path)
        n_dups = dups.count()
        lineage.write_audit(
            lineage.audit_columns(
                dups,
                rid,
                F.lit("scan"),
                F.lit("omit"),
                F.lit("dedup_content_hash"),
                F.lit("duplicate"),
                F.lit(None).cast("string"),
                content_hash_col=F.col("content_hash"),
            ),
            out,
            "scan",
            rid,
        )
        ck = lineage.commit_phase(out, rid, "scan", n_dups=n_dups, wall_s=time.time() - t0)
    summary["phases"]["scan"] = ck
    n_dups = ck["n_dups"]

    # ---------------- phase: parse (decode + models, vectorized) -----------
    feats_path = lineage.stage_dir(out, rid, "features")

    def _parse_frame() -> DataFrame:
        """The (lazy) parse DataFrame: marker/dup anti-join -> salted
        repartition -> Arrow parse stage."""
        src = src_scan.with_content_hash(src_scan.read_source(spark, cfg.source_path))
        if cfg.incremental:
            # this run's committed scan audit subsumes the dup anti-join,
            # but its own store audit must NOT mask rows on a fused-mode
            # retry (crash between store write_audit and commit)
            marker = lineage.processed_keys(
                spark, out, exclude_run_id=rid, exclude_phases=("store",)
            )
            if marker is not None:
                src = src.join(marker, ["image_id", "content_hash"], "left_anti")
        else:
            dups = spark.read.parquet(dups_path)
            src = src_scan.anti_join_ids(src, dups, broadcast=n_dups <= cfg.dup_broadcast_max)
        n_part = spark.sparkContext.defaultParallelism * 2
        salted = _salted_repartition(src, cfg, n_part)
        return salted.mapInPandas(
            make_parse_stage(cfg.stop_on_error), schema=PARSE_OUTPUT_SCHEMA
        )

    ck = cfg.resume and lineage.phase_committed(out, rid, "parse")
    if cfg.fused:
        # throughput mode: no features staging; parse fuses into the
        # store job below. Resume granularity coarsens to the whole
        # process step (gobulk ContainerBulkSize=inf analogue).
        ck = ck or {"phase": "parse", "status": "fused-into-store"}
    elif not ck:
        if (p := _pause_check("parse")) is not None:
            return p
        t0 = time.time()
        feats = _parse_frame()
        # row count via observation on the write job — no second scan
        obs = Observation(f"parse-{rid}")
        feats = feats.observe(obs, F.count(F.lit(1)).alias("n_rows"))
        feats.write.mode("overwrite").parquet(feats_path)
        ck = lineage.commit_phase(
            out, rid, "parse", n_rows=obs.get["n_rows"], wall_s=time.time() - t0
        )
    summary["phases"]["parse"] = ck

    # ---------------- phase: store (decide, write kept/audit/metrics) ------
    ck = cfg.resume and lineage.phase_committed(out, rid, "store")
    if not ck:
        if (p := _pause_check("store")) is not None:
            return p
        t0 = time.time()
        # heal half-finished kept swaps from a crashed earlier attempt
        # BEFORE anything reads the kept store
        sink.recover(spark)
        feats = _parse_frame() if cfg.fused else spark.read.parquet(feats_path)
        decided = decision_columns(feats, cfg.thresholds)
        # existence check refines create/omit into update/delete for ids
        # already in the kept store (gobulk Update/Delete ops,
        # executor.go:96-113; format emits Update when the row exists,
        # runner_test.go:638-702)
        existing = sink.existing_ids(spark, exclude_run_id=rid)
        decided = executor.classify_actions(decided, existing)
        persisted = False
        if existing is not None:
            # MATERIALIZE (not just persist) before the delete step:
            # decided's lineage includes the classify join over kept
            # files the deletes will atomically swap out — a lost cached
            # partition afterwards would recompute from deleted files
            # (FileNotFoundException mid-write on a real cluster)
            decided_path = lineage.stage_dir(out, rid, "decided")
            decided.write.mode("overwrite").parquet(decided_path)
            decided = spark.read.parquet(decided_path)
        elif cfg.fused:
            # three writes consume the frame; cache so parse runs once
            decided = decided.persist()
            persisted = True
        if cfg.stop_on_error:
            n_issue = decided.where(F.col("action") == "issue").count()
            if n_issue:
                raise RuntimeError(f"StopOnError: {n_issue} issue rows in parse output")
        # per-sub-operation tracking (gobulk executor sub-op recursion,
        # E4): each store write records its wall + completion in the
        # commit manifest; an exception aborts before commit, so a
        # manifest listing a sub-op proves it finished
        subops: list[dict] = []

        def _sub(name: str, fn) -> None:
            ts = time.time()
            fn()
            subops.append({"op": name, "wall_s": round(time.time() - ts, 3), "ok": True})

        # --- D: remove prior kept rows of update/delete ids (staged
        #        rewrite + atomic swap; idempotent under retry) ---------
        if existing is not None:
            _sub("delete", lambda: executor.execute_deletes(spark, sink, rid, decided))
        # --- U + C: this run's kept rows land in the sink's run scope --
        # per-run overwrite = idempotent under store-phase retry even on
        # incremental runs (run 2's retry never touches run 1)
        _sub("write_kept", lambda: sink.write(executor.kept_rows(decided, KEPT_COLUMNS), rid))
        # --- O: omits/issues reach only the audit + metrics tables -----
        audit = executor.store_audit_columns(decided, rid)
        # run totals ride the audit write as an observation — no read-back
        obs = Observation(f"store-{rid}")
        audit = audit.observe(
            obs,
            F.count(F.lit(1)).alias("rows_in"),
            F.sum(F.col("action").isin("create", "update").cast("long")).alias("kept"),
            F.sum(F.col("action").isin("omit", "delete").cast("long")).alias("dropped"),
            F.sum((F.col("action") == "issue").cast("long")).alias("issues"),
        )
        _sub("write_audit", lambda: lineage.write_audit(audit, out, "store", rid))
        _sub(
            "write_metrics",
            lambda: lineage.write_metrics(
                lineage.partition_metrics(decided, rid), out, "store", rid
            ),
        )
        stats = obs.get
        if persisted:
            decided.unpersist()
        if existing is not None:
            # the staged decided snapshot served its purpose (stable
            # input across the delete step); don't let one copy per run
            # accumulate under _stage
            from .fsutil import Fs

            Fs(spark, out).delete(lineage.stage_dir(out, rid, "decided"))
        ck = lineage.commit_phase(
            out,
            rid,
            "store",
            rows_in=stats["rows_in"],
            kept=stats["kept"],
            dropped=stats["dropped"],
            issues=stats["issues"],
            subops=subops,
            wall_s=time.time() - t0,
        )
    summary["phases"]["store"] = ck
    summary["status"] = "completed"
    summary["wall_s"] = time.time() - t_start
    return summary
