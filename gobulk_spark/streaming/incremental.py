"""Streaming ingest: the gobulk listen-loop as Structured Streaming.

gobulk's poll-forever mode (``Run(ctx, interval, ...)``, runner.go:90-105,
with Listener.Listen feeding new containers as they appear,
listener.go:49-122) is exactly Spark's file-source streaming with
``Trigger.AvailableNow``: each new source file is a discovered container
bulk, each micro-batch is one Reader->Parser->Planner->Executor sweep,
and Spark's checkpointLocation replaces the tracker's marker.

``foreachBatch`` reuses the *batch* stage functions unchanged — one code
path for both modes (the engine contract, not two engines).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import executor, lineage
from ..config import PipelineConfig
from ..pipeline import KEPT_COLUMNS, KEPT_SCHEMA_DDL
from ..plan import decision_columns
from ..sinks import KeptSink, ParquetKeptSink
from ..sources import scan as src_scan
from ..stages import PARSE_OUTPUT_SCHEMA, make_parse_stage

SOURCE_DDL = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long"
)

#: epochs append O(epoch) marker deltas; every Nth advance compacts
#: (a full snapshot rewrite per epoch would be O(corpus ids) — the
#: write cost a small-epoch stream cannot pay at warehouse scale)
MARKER_COMPACT_EVERY = 8


def _use_merge(sink) -> bool:
    """True for sinks that land the epoch's upsert as ONE atomic
    commit (sink.merge) instead of the delete-then-write pair."""
    return bool(getattr(sink, "supports_atomic_upsert", False))


def _retry_root(out_dir: str) -> str:
    from ..lineage import _join

    return _join(out_dir, "_retry", "pending")


def _stage_retry(
    spark: SparkSession, out_dir: str, rid: str, seq: int, rows: DataFrame
) -> None:
    """Stage kept rows the sink permanently failed this epoch for a
    future drain, stamped with the staging epoch so a later drain keeps
    the LATEST version per id. Idempotent per epoch (overwrite of
    run=<rid>)."""
    from ..lineage import _join

    rows.withColumn("retry_epoch", F.lit(seq).cast("long")).write.mode(
        "overwrite"
    ).parquet(_join(_retry_root(out_dir), f"run={rid}"))


def _read_retry_queue(
    spark: SparkSession, out_dir: str, rid: str
) -> tuple[DataFrame | None, list[str], int]:
    """Pending previously-failed kept rows, LATEST version per id.

    Returns (rows, consumed_dir_names, next_seq); rows is None when the
    queue is empty. The current epoch's own staging dir (a torn
    foreachBatch retry may have written it) is excluded — the retried
    epoch re-derives its own failures. An id staged twice (failed, then
    re-delivered with new content and failed again) resolves to the
    highest retry_epoch stamp: retrying an arbitrary version could land
    stale content and poison the marker with its stale (id, hash).

    ``next_seq`` is max(existing stamps) + 1 — the stamp THIS epoch
    must stage its failures under. The foreachBatch epoch counter is
    NOT usable as the stamp: it resets when a stream restarts under a
    new checkpoint, so an undrained dir from a prior run (stamped,
    say, 5) would beat the newer content a fresh run staged at epoch 0
    and land stale data. Deriving the stamp from the queue itself keeps
    it monotonic per out_dir across restarts (re-staged rows always get
    a stamp above every dir they superseded)."""
    from pyspark.sql.window import Window

    from ..fsutil import Fs
    from ..lineage import _join

    fs = Fs(spark, out_dir)
    root = _retry_root(out_dir)
    if not fs.exists(root):
        return None, [], 1
    dirs = [
        d for d in fs.listdir(root) if d.startswith("run=") and d != f"run={rid}"
    ]
    if not dirs:
        return None, [], 1
    # mergeSchema: a queue staged by a pre-stamp version of this code
    # has no retry_epoch column (and a mixed root has it in SOME dirs);
    # those rows drain as epoch 0 — strictly older than anything the
    # stamped code writes (stamps start at 1), so latest-wins holds
    raw = spark.read.option("mergeSchema", "true").parquet(
        *[_join(root, d) for d in dirs]
    )
    if "retry_epoch" not in raw.columns:
        raw = raw.withColumn("retry_epoch", F.lit(0).cast("long"))
    else:
        raw = raw.withColumn(
            "retry_epoch", F.coalesce(F.col("retry_epoch"), F.lit(0).cast("long"))
        )
    next_seq = int(raw.agg(F.max("retry_epoch")).first()[0] or 0) + 1
    w = Window.partitionBy("image_id").orderBy(
        F.col("retry_epoch").desc(), F.col("content_hash").desc()
    )
    pend = (
        raw.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "retry_epoch")
    )
    return pend, dirs, next_seq


def _process_microbatch(
    batch: DataFrame, epoch_id: int, cfg: PipelineConfig, sink: KeptSink | None = None
) -> None:
    """One micro-batch through the same scan→parse→store semantics."""
    spark = batch.sparkSession
    rid = f"{cfg.run_id}-e{epoch_id}"
    out = cfg.out_dir
    sink = sink if sink is not None else ParquetKeptSink(out)
    # dead-letter queue peek (driver-side listdir, lazy read) doubles as
    # the no-op gate: a sweep whose discovered files hold ZERO rows and
    # whose retry queue is empty has nothing to scan, parse, store or
    # mark — short-circuit the ~20 fixed jobs (a poll-forever stream
    # hits this shape on every empty trigger file). A non-empty queue
    # still processes: an empty sweep is a valid heal trigger.
    pend, consumed, retry_seq = _read_retry_queue(spark, out, rid)
    if not consumed and batch.isEmpty():
        return
    # input_file_name() returns '' (not NULL) inside foreachBatch, so a
    # plain coalesce never falls back — nullif first
    src = src_scan.with_content_hash(
        batch.withColumn(
            "source_file",
            F.coalesce(F.nullif(F.input_file_name(), F.lit("")), F.lit("stream")),
        )
    )
    # in-batch content dedup (cross-batch dedup = the marker/audit check)
    dups = src_scan.find_duplicates(src, carry=("source_file",))
    # compacted-snapshot marker on the LATEST content_hash per id:
    # changed (or reverted) content re-enters as an update. The
    # snapshot advances only at the END of this function and records
    # its epoch, so a foreachBatch RETRY of the same epoch reads the
    # predecessor snapshot — never masked by its own half-committed
    # outputs (and, unlike the round-2 audit-scan marker, the retry
    # re-detects and re-audits the epoch's duplicates identically).
    marker = lineage.processed_keys(spark, out, exclude_run_id=rid)
    if marker is not None:
        src = src.join(marker, ["image_id", "content_hash"], "left_anti")
    # the scan-audit write IS the dup count (observation): an
    # AvailableNow drain with no maxFilesPerTrigger can make one epoch
    # of the entire backlog, so the dup list gets the same broadcast
    # guard as the batch pipeline — never an unconditional broadcast
    from pyspark.sql import Observation

    obs = Observation(f"stream-scan-{rid}")
    dups_audit = lineage.audit_columns(
        dups,
        rid,
        F.lit("scan"),
        F.lit("omit"),
        F.lit("dedup_content_hash"),
        F.lit("duplicate"),
        F.lit(None).cast("string"),
        content_hash_col=F.col("content_hash"),
    ).observe(obs, F.count(F.lit(1)).alias("n_dups"))
    lineage.write_audit(dups_audit, out, "scan", rid)
    n_dups = obs.get["n_dups"]
    deduped = src_scan.anti_join_ids(
        src, dups, broadcast=n_dups <= cfg.dup_broadcast_max
    )
    feats = deduped.mapInPandas(
        make_parse_stage(cfg.stop_on_error), schema=PARSE_OUTPUT_SCHEMA
    )
    decided = decision_columns(feats, cfg.thresholds)
    sink.recover(spark)  # heal before reading kept
    sink.validate(spark, KEPT_SCHEMA_DDL)  # schema gate, fail fast
    existing = sink.existing_ids(spark, exclude_run_id=rid)
    decided = executor.classify_actions(decided, existing)
    # ALWAYS persist: four downstream actions (kept write, store audit,
    # metrics, marker advance) consume this frame — without the cache,
    # epoch 0 of a stream (the full initial backlog, existing=None)
    # re-ran the whole decode+model parse stage once per action
    decided = decided.persist()
    persisted, staged = True, False
    # after the persist so the probe populates (not bypasses) the
    # cache; keep the persisted parent for unpersist (a derived frame's
    # unpersist is a no-op) — see pipeline.py
    _cached = decided
    # ONE probe job answers the re-delivery check AND the
    # update/delete-presence check (was two jobs against the ~6-job
    # fixed epoch floor)
    (
        _n_rows,
        _n_keys,
        n_affected,
        n_pure_del,
        _n_kept_pairs,
        _n_kept_ids,
    ) = executor.probe_decided(decided)
    decided = executor.dedup_exact_redeliveries(decided, probe=(_n_rows, _n_keys))
    # distinct-content siblings of one id: deterministic winner, losers
    # routed as issues — without this, sink.merge refuses the duplicate
    # key and the failing epoch re-delivers from the checkpoint FOREVER
    decided = executor.resolve_conflicting_ids(
        decided, probe=(_n_kept_pairs, _n_kept_ids)
    )
    if existing is not None:
        # materialize before deletes mutate the files decided's lineage
        # reads (see pipeline.py store phase) — but only when deletes
        # WILL run: on a mostly-append stream the per-epoch staging
        # write dominated the epoch cost (round-2 profile), and with an
        # empty affected set nothing swaps, so the persist suffices
        if n_affected:
            decided_path = lineage.stage_dir(out, rid, "decided")
            decided.write.mode("overwrite").parquet(decided_path)
            _cached.unpersist()  # the persisted parent, not the view
            persisted = False
            decided = spark.read.parquet(decided_path)
            staged = True
            # merge-capable sinks replace updated ids inside the epoch's
            # upsert commit; only pure deletes still need the D verb —
            # one commit per epoch instead of two, and half the log
            # growth on an update-heavy stream
            if not _use_merge(sink):
                executor.execute_deletes(spark, sink, rid, decided)
            elif n_pure_del:
                executor.execute_deletes(
                    spark, sink, rid, decided, actions=("delete",)
                )
    # dead-letter drain: the stream checkpoint has already consumed the
    # source files of previously-failed rows, so — unlike batch, where
    # manifest withholding forces a source re-read — the ONLY in-stream
    # re-delivery lever is this staged retry queue of kept rows. The
    # queue joins THIS epoch's SINGLE sink.write: the sink contract is
    # per-run overwrite, so a second drain write under the same rid
    # would silently replace the epoch's own freshly-landed rows. A
    # queued id superseded by a fresh decision this epoch (any action —
    # newer content arrived) is dropped, as is one already present in
    # the store (a torn epoch that landed its drain but crashed before
    # consuming the queue dirs must not land it twice under a second
    # run scope). The queue itself was read at the top of the epoch
    # (it doubles as the no-op gate).
    if pend is not None:
        pend = pend.join(
            decided.select("image_id").distinct(), "image_id", "left_anti"
        )
        # fresh existence read (NOT the `existing` frame above: its file
        # index predates this epoch's delete swaps — a stale listing by
        # now). Paid only on the failure path (non-empty queue)
        landed_prior = sink.existing_ids(spark, exclude_run_id=rid)
        if landed_prior is not None:
            pend = pend.join(landed_prior, "image_id", "left_anti")
        # sever lineage from the queue dirs deleted below, and
        # materialize once for the several consumers (write, audit,
        # marker, re-stage)
        pend = pend.localCheckpoint(eager=True)
    to_write = executor.kept_rows(decided, KEPT_COLUMNS)
    if pend is not None:
        to_write = to_write.unionByName(pend.select(*KEPT_COLUMNS))
    # failures normalized to a DataFrame — all routing below is joins,
    # never driver-side id lists (a sink failing a whole epoch must not
    # become an isin() expression bomb); see executor.failures_frame
    if _use_merge(sink):
        # skip the commit when the epoch kept nothing and no queued
        # rows drain — an empty merge would grow the log by a no-op
        # entry per idle epoch (the probe's kept-pair count makes the
        # guard free; a conflict resolution never zeroes it, every
        # conflicted id keeps its winner). A queue that EXISTS but
        # drains to zero rows after the anti-joins must not commit
        # either — pend is an eager localCheckpoint here, so the
        # isEmpty probe is bounded driver work, not a recompute
        if _n_kept_pairs or (pend is not None and not pend.isEmpty()):
            sink.merge(spark, rid, to_write)
        failed = None
    else:
        failed = executor.failures_frame(spark, sink.write(to_write, rid))
    failed_ids = failed.select("image_id").distinct() if failed is not None else None
    retried = None
    if pend is not None:
        retried = (
            pend.join(failed_ids, "image_id", "left_anti")
            if failed_ids is not None
            else pend
        )
    # epoch totals ride the store-audit write as an observation
    # (attached BEFORE the failure/retry unions so the counts cover
    # exactly the decided rows) — the per-partition metrics groupBy
    # job this replaces was one of the fixed ~6 jobs bounding the
    # round-3 epoch floor at 7 s
    obs_store = Observation(f"stream-store-{rid}")
    audit = executor.store_audit_columns(decided, rid).observe(
        obs_store,
        F.count(F.lit(1)).alias("rows_in"),
        F.sum(F.col("action").isin("create", "update").cast("long")).alias("kept"),
        F.sum(F.col("action").isin("omit", "delete").cast("long")).alias("dropped"),
        F.sum((F.col("action") == "issue").cast("long")).alias("issues"),
    )
    if failed is not None:
        # per-item sink failures land as audit issues (see pipeline.py)
        audit = audit.unionByName(executor.write_failure_audit(failed, rid))
        # ALL failed rows — fresh and re-failed queued ones — re-stage
        # under this epoch's run scope, stamped with the queue-derived
        # monotonic seq (NOT epoch_id, which resets on stream restart)
        # for the latest-version-wins resolution; staged BEFORE the
        # consumed dirs are deleted, so a crash in between re-drains
        # next epoch (safe: sink writes are idempotent per run scope)
        _stage_retry(
            spark,
            out,
            rid,
            retry_seq,
            to_write.join(failed_ids, "image_id", "left_semi"),
        )
    if retried is not None:
        # previously-failed rows that landed this epoch: close the loop
        # in the audit (their failure epochs recorded them as issues)
        audit = audit.unionByName(
            lineage.audit_columns(
                retried,
                rid,
                F.lit("store"),
                F.lit("retry_landed"),
                F.lit("sink_retry_queue"),
                F.lit(None).cast("string"),
                F.lit(None).cast("string"),
                content_hash_col=F.col("content_hash"),
            )
        )
    lineage.write_audit(audit, out, "store", rid)
    # the observed totals land as ONE metrics row (partition_id=-1
    # marks an epoch-totals row vs batch's per-partition rows; same
    # schema, so read_metrics unions both). A 1-row local-relation
    # write costs milliseconds where the old groupBy re-aggregated the
    # cached decided frame with a shuffle every epoch
    st = obs_store.get
    lineage.write_metrics(
        spark.createDataFrame(
            [
                (
                    -1,
                    st["rows_in"],
                    int(st["kept"] or 0),
                    int(st["dropped"] or 0),
                    int(st["issues"] or 0),
                    rid,
                )
            ],
            "partition_id int, rows_in long, rows_kept long, "
            "rows_dropped long, rows_issued long, run_id string",
        ),
        out,
        "store",
        rid,
    )
    # advance the compacted marker with this epoch's pairs (decided +
    # in-batch dups + drained retries); the atomic pointer flip is the
    # epoch's cross-batch dedup commit point, retry-idempotent
    # (predecessor snapshot kept). Items the sink failed to land stay
    # OUT of the marker and in the retry queue
    new_pairs = decided.select("image_id", "content_hash")
    if failed_ids is not None:
        new_pairs = new_pairs.join(failed_ids, "image_id", "left_anti")
    if retried is not None:
        new_pairs = new_pairs.unionByName(
            retried.select("image_id", "content_hash")
        )
    if n_dups:
        # reuse the committed scan-audit leaf instead of recomputing
        # the dedup scan (pipeline.py does the same)
        new_pairs = new_pairs.unionByName(
            spark.read.parquet(lineage.audit_leaf(out, "scan", rid)).select(
                "image_id", "content_hash"
            )
        )
    lineage.advance_marker(
        spark,
        out,
        rid,
        new_pairs,
        compact_every=MARKER_COMPACT_EVERY,
    )
    # queue dirs consumed — deleted only now, after the marker flip
    # committed the epoch: a crash anywhere above re-drains them (the
    # store exclusion on pend makes that idempotent)
    if consumed:
        from ..fsutil import Fs
        from ..lineage import _join

        fs = Fs(spark, out)
        for d in consumed:
            fs.delete(_join(_retry_root(out), d))
    # post-epoch maintenance (sinks that support it): per-epoch commits
    # fragment a table-format store into one small file set per epoch —
    # the sink compacts when its live-file count crosses its threshold,
    # so the stream stays scannable without an external OPTIMIZE cron.
    # After the marker flip: compaction must never run inside the
    # epoch's commit window (it is content-preserving, but a crash
    # mid-rewrite should leave a committed epoch, not a torn one).
    # Best-effort by contract: the epoch is already committed, so a
    # maintenance failure (e.g. an optimize losing its OCC race until
    # retries run out) must not fail the batch and kill the stream —
    # the next epoch simply retries compaction (round-6 ADVICE)
    if hasattr(sink, "maintain"):
        try:
            sink.maintain(spark)
        except Exception as exc:  # pragma: no cover - timing-dependent
            import logging

            logging.getLogger(__name__).warning(
                "post-epoch maintenance failed (will retry next epoch): %s",
                exc,
            )
    if persisted:
        _cached.unpersist()
    if staged:
        # one staged snapshot per EPOCH would grow without bound on a
        # long-lived stream; drop it once the epoch's writes are done
        from ..fsutil import Fs

        Fs(spark, out).delete(lineage.stage_dir(out, rid, "decided"))


def run_streaming_ingest(
    spark: SparkSession,
    cfg: PipelineConfig,
    source_dir: str,
    max_files_per_trigger: int | None = None,
    sink: KeptSink | None = None,
) -> None:
    """Drain all currently-available source files, then stop.

    AvailableNow = gobulk interval==0 (one sweep then return,
    runner.go:98-104); rerunning later picks up only new files via the
    stream checkpoint — the LastTrackedContainer marker.
    """
    reader = (
        spark.readStream.schema(SOURCE_DDL)
        .format("parquet")
        .option("path", source_dir)
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    from ..deploy import ship

    ship(spark)  # microbatch UDFs need the package on executors
    stream = reader.load()
    q = (
        stream.writeStream.foreachBatch(
            lambda df, eid: _process_microbatch(df, eid, cfg, sink)
        )
        .option("checkpointLocation", os.path.join(cfg.out_dir, "_stream_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
