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
from .sources import manifest as src_manifest
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

#: declared kept-store schema — deep-diffed against the live store
#: before any write (gobulk validates its output schema on setup,
#: output/elasticsearch.go:153-158, output/mysql.go:48-76)
KEPT_SCHEMA_DDL = (
    "image_id string, source_file string, content_hash string, "
    "w int, h int, fmt string, phash bigint, caption string, "
    "lang string, lang_conf double, ppl double"
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
    from .session import ensure_active

    ensure_active(spark)  # scheduler-thread drivers: getActiveSession
    # is a JVM thread-local, unset off the main thread
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

    # ---------------- phase: scan (discover, prune, marker, dedup) ---------
    # the run's FROZEN file set: listed once through the Hadoop FS
    # (driver-side, gobulk's S3-list cost) and staged, so scan, parse
    # and any crash-retry see the identical files even if the source
    # mutates mid-run. Incremental runs prune files whose (length,
    # mtime) match the last committed manifest BEFORE any byte is read
    # — the content-hash md5 then runs only over changed data (gobulk
    # takes ContentHash from the listing ETag, input/s3.go:203-205;
    # round 2 re-hashed the whole corpus every sweep).
    scan_set = src_manifest.run_scan_set(spark, out, rid, cfg.source_path)

    def _source_frame() -> DataFrame:
        if cfg.incremental:
            src = src_manifest.read_changed_files(
                spark, cfg.source_path, scan_set["changed"]
            )
        else:
            src = src_scan.read_source(spark, cfg.source_path)
        return src_scan.with_content_hash(src)

    scan_audit_path = lineage.audit_leaf(out, "scan", rid)
    ck = cfg.resume and lineage.phase_committed(out, rid, "scan")
    if not ck:
        if (p := _pause_check("scan")) is not None:
            return p
        t0 = time.time()
        src = _source_frame()
        if cfg.incremental:
            # marker keys on the LATEST content_hash per id: a
            # re-scanned id with NEW (or reverted) content passes the
            # anti-join and re-enters as an update/delete (gobulk
            # tracker/gorm.go:441-449 re-tracks per iteration). The
            # compacted-snapshot marker advances only at store commit
            # and excludes THIS run's torn snapshot, so a retried scan
            # sees the same input as the first attempt.
            marker = lineage.processed_keys(spark, out, exclude_run_id=rid)
            if marker is not None:
                src = src.join(marker, ["image_id", "content_hash"], "left_anti")
        # narrow-projection dedup: Catalyst prunes the scan to 3 columns;
        # source_file rides along so the audit needs no join back. The
        # audit write IS the dup list (parse anti-joins the committed
        # scan-audit partition) — no separate staging write, and n_dups
        # rides the write as an observation: one job for the phase.
        dups_audit = lineage.audit_columns(
            src_scan.find_duplicates(src, carry=("source_file",)),
            rid,
            F.lit("scan"),
            F.lit("omit"),
            F.lit("dedup_content_hash"),
            F.lit("duplicate"),
            F.lit(None).cast("string"),
            content_hash_col=F.col("content_hash"),
        )
        obs = Observation(f"scan-{rid}")
        dups_audit = dups_audit.observe(obs, F.count(F.lit(1)).alias("n_dups"))
        lineage.write_audit(dups_audit, out, "scan", rid)
        scan_stats = dict(scan_set["stats"])
        if not cfg.incremental:
            # a full run reads EVERY file regardless of the manifest
            # diff — reporting the changed subset here would fabricate
            # the very prune-economics evidence the bench cites
            scan_stats["source_files_scanned"] = scan_stats["source_files_total"]
            scan_stats["source_bytes_scanned"] = scan_stats["source_bytes_total"]
        ck = lineage.commit_phase(
            out,
            rid,
            "scan",
            n_dups=obs.get["n_dups"],
            wall_s=time.time() - t0,
            **scan_stats,
        )
    summary["phases"]["scan"] = ck
    n_dups = ck["n_dups"]

    # ---------------- phase: parse (decode + models, vectorized) -----------
    feats_path = lineage.stage_dir(out, rid, "features")

    def _parse_frame() -> DataFrame:
        """The (lazy) parse DataFrame: marker/dup anti-join -> salted
        repartition -> Arrow parse stage."""
        src = _source_frame()
        if cfg.incremental:
            # snapshot marker (excluding this run's torn snapshot, so a
            # fused-mode retry after a crashed store is not masked by
            # its own half-committed state)
            marker = lineage.processed_keys(spark, out, exclude_run_id=rid)
            if marker is not None:
                src = src.join(marker, ["image_id", "content_hash"], "left_anti")
        if n_dups:  # dup ids come from the committed scan-audit partition
            dups = spark.read.parquet(scan_audit_path)
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
        # intermittence (gobulk C4, format.go:56-63): postpone the
        # store-mutating phase until the operator's window opens.
        # scan/parse above already ran — the wait starts from staged
        # features. Pause stays honored while waiting.
        waited = 0.0
        while (until := lineage.intermit_until(out, spark)) is not None:
            remaining = until - time.time()
            if remaining <= 0:
                break
            if (p := _pause_check("store")) is not None:
                p["intermitted_s"] = round(waited, 3)
                return p
            step = min(remaining, 0.5)
            time.sleep(step)
            waited += step
        if waited:
            summary["intermitted_s"] = round(waited, 3)
        t0 = time.time()
        # heal half-finished kept swaps from a crashed earlier attempt
        # BEFORE anything reads the kept store
        sink.recover(spark)
        # schema gate: a store written under a different engine version
        # fails fast with the full diff, never silently unioned
        sink.validate(spark, KEPT_SCHEMA_DDL)
        feats = _parse_frame() if cfg.fused else spark.read.parquet(feats_path)
        decided = decision_columns(feats, cfg.thresholds)
        # existence check refines create/omit into update/delete for ids
        # already in the kept store (gobulk Update/Delete ops,
        # executor.go:96-113; format emits Update when the row exists,
        # runner_test.go:638-702)
        existing = sink.existing_ids(spark, exclude_run_id=rid)
        decided = executor.classify_actions(decided, existing)
        persisted = staged = False
        probe3 = None
        if existing is not None:
            # several consumers below (affected probe, writes, metrics);
            # cache so the classify join + parse chain runs once
            decided = decided.persist()
            persisted = True
            # ONE probe job (populating the cache) answers the
            # update/delete-presence check AND the re-delivery check
            # below — was two separate jobs
            probe3 = executor.probe_decided(decided)
            # MATERIALIZE (not just persist) before the delete step —
            # but ONLY when deletes will actually run: decided's lineage
            # includes the classify join over kept files the deletes
            # atomically swap out, and a lost cached partition afterwards
            # would recompute from deleted files (FileNotFoundException
            # mid-write on a real cluster). With no update/delete rows
            # nothing swaps, so the staging write (a full extra pass,
            # the round-2 fixed-cost profile top) is skipped.
            if probe3[2]:
                decided_path = lineage.stage_dir(out, rid, "decided")
                decided.write.mode("overwrite").parquet(decided_path)
                decided.unpersist()
                persisted = False
                decided = spark.read.parquet(decided_path)
                staged = True
        elif cfg.fused:
            # three writes consume the frame; cache so parse runs once
            decided = decided.persist()
            persisted = True
        # AFTER the persist/staging block so the probe inside reads the
        # cache / staged parquet, never a fresh parse execution. Keep
        # the persisted parent: unpersist on a derived frame is a no-op
        _cached = decided
        decided = executor.dedup_exact_redeliveries(
            decided, probe=probe3[:2] if probe3 else None
        )
        # distinct-content siblings of one id (dedup above only folds
        # IDENTICAL copies): deterministic winner, losers become issue
        # rows — a merge sink would otherwise refuse the duplicate-key
        # upsert, and a plain sink would land two rows under one id
        decided = executor.resolve_conflicting_ids(
            decided, probe=probe3[4:6] if probe3 else None
        )
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
        # A merge-capable sink (supports_atomic_upsert) replaces
        # updated ids INSIDE the upsert commit, so D narrows to pure
        # deletes — one commit per run instead of two, and a reader
        # never sees an updated id's delete-without-rewrite window
        use_merge = bool(getattr(sink, "supports_atomic_upsert", False))
        if staged:  # only when update/delete rows exist (probe above)
            if not use_merge:
                _sub(
                    "delete",
                    lambda: executor.execute_deletes(spark, sink, rid, decided),
                )
            elif probe3 and probe3[3]:
                _sub(
                    "delete",
                    lambda: executor.execute_deletes(
                        spark, sink, rid, decided, actions=("delete",)
                    ),
                )
        # --- U + C: this run's kept rows land in the sink's run scope --
        # per-run overwrite = idempotent under store-phase retry even on
        # incremental runs (run 2's retry never touches run 1).
        # A transactional backend may return per-item failures it could
        # not land after its retry budget — routed below to the audit as
        # issue rows and excluded from the marker so they re-enter next
        # run (gobulk records failed ops as issues, issue.go:137-146).
        # Normalized to a DataFrame: every consumer joins against it, so
        # wholesale failure never builds a driver-side id list
        _fail_box: list = [None]

        def _write_kept() -> None:
            rows = executor.kept_rows(decided, KEPT_COLUMNS)
            if use_merge:
                # no kept rows (idle incremental sweep, all-dropped
                # batch): skip the commit entirely — an empty merge
                # grows the log by one no-op entry + one empty file per
                # run. The guard is free when the probe ran (kept-pair
                # count already computed); first runs without an
                # existing store pay one bounded isEmpty job
                empty = (probe3[4] == 0) if probe3 else rows.isEmpty()
                if empty:
                    return
                # atomic upsert: replaces updated ids, appends creates.
                # Duplicate ids cannot reach here: resolve_conflicting_
                # ids collapsed same-id different-content siblings to
                # the deterministic winner (merge itself still refuses
                # duplicates as a backstop)
                sink.merge(spark, rid, rows)
            else:
                f = sink.write(rows, rid)
                _fail_box[0] = executor.failures_frame(spark, f)

        _sub("merge_kept" if use_merge else "write_kept", _write_kept)
        failed_df = _fail_box[0]
        # bounded count for the commit manifest (the frame is either a
        # local relation or a staged-parquet read-back — one cheap job)
        n_failed = failed_df.count() if failed_df is not None else 0
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
        if n_failed:
            audit = audit.unionByName(executor.write_failure_audit(failed_df, rid))
        _sub("write_audit", lambda: lineage.write_audit(audit, out, "store", rid))
        _sub(
            "write_metrics",
            lambda: lineage.write_metrics(
                lineage.partition_metrics(decided, rid), out, "store", rid
            ),
        )
        # compacted-marker advance: this run's (id, latest hash) pairs —
        # decided rows plus the scan-phase dups — merge into the O(ids)
        # snapshot the NEXT run's anti-join reads (replaces round 2's
        # full-audit groupBy). Pointer flip is atomic; retry-idempotent.
        new_pairs = decided.select("image_id", "content_hash")
        if n_failed:
            # a row the sink could not land is NOT processed: keeping it
            # out of the marker makes the next incremental run re-import
            # it (the retry tier above bounded retries; this is the
            # next-iteration tier). Anti-join, never isin: wholesale
            # failure would otherwise inline every id into the plan
            new_pairs = new_pairs.join(
                failed_df.select("image_id").distinct(), "image_id", "left_anti"
            )
        if n_dups:
            new_pairs = new_pairs.unionByName(
                spark.read.parquet(scan_audit_path).select(
                    "image_id", "content_hash"
                )
            )
        _sub(
            "advance_marker",
            lambda: lineage.advance_marker(spark, out, rid, new_pairs),
        )
        # file-manifest advance: the frozen listing this run processed
        # becomes the next run's prune baseline (committed before the
        # phase flip so a crash in between re-commits identical content).
        # Files holding sink-FAILED rows are withheld: "unchanged file"
        # must mean "all rows landed", or the prune would mask the
        # re-import the marker exclusion above arranged.
        manifest_files = scan_set["files"]
        if n_failed:
            # distinct source FILES of failed rows — bounded by the file
            # count (which the driver already holds as the manifest), so
            # this collect never scales with row-level failure volume
            failed_files = {
                src_manifest.norm_path(r["source_file"])
                for r in failed_df.select("source_file").distinct().collect()
            }
            if None in failed_files:  # unknown provenance: withhold all
                manifest_files = []
            else:
                manifest_files = [
                    f
                    for f in manifest_files
                    if src_manifest.norm_path(f["path"]) not in failed_files
                ]
        _sub(
            "commit_manifest",
            lambda: src_manifest.commit_manifest(spark, out, rid, manifest_files),
        )
        stats = obs.get
        if persisted:
            _cached.unpersist()
        if staged:
            # the staged decided snapshot served its purpose (stable
            # input across the delete step); don't let one copy per run
            # accumulate under _stage
            from .fsutil import Fs

            Fs(spark, out).delete(lineage.stage_dir(out, rid, "decided"))
        # `kept` must count rows that LANDED: the observation runs over
        # decided actions before sink failures are known, and a failed
        # row was audited as an issue and withheld from the marker —
        # reporting it inside kept would make the manifest disagree
        # with the store (failures are create/update rows by
        # construction: only kept_rows() reach sink.write)
        ck = lineage.commit_phase(
            out,
            rid,
            "store",
            rows_in=stats["rows_in"],
            # sum() observations are None on a zero-row write (an
            # unchanged-source incremental run) — treat as 0
            kept=(stats["kept"] or 0) - n_failed,
            dropped=stats["dropped"] or 0,
            issues=(stats["issues"] or 0) + n_failed,
            sink_failed=n_failed,
            subops=subops,
            wall_s=time.time() - t0,
        )
    summary["phases"]["store"] = ck
    summary["status"] = "completed"
    summary["wall_s"] = time.time() - t_start
    return summary
