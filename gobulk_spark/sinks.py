"""Pluggable kept-store sinks — gobulk's Output interface seam.

gobulk defines Output with Elements (existence lookup) and
Create/Update/Delete execution (output.go:12-16) and ships ES and
GORM/MySQL backends (output/elasticsearch.go:231-320,
output/gorm.go:114-152). The engine here is sink-agnostic through the
same verbs:

- validate      — schema check against the live store BEFORE any write
                  (gobulk deep-equal-diffs the declared schema on setup,
                  output/elasticsearch.go:153-158, output/mysql.go:48-76)
- recover       — heal half-finished writes before any read
- existing_ids  — Output.Elements: which incoming ids already exist
- write         — Create/Update: land a run's kept rows; returns
                  per-item FAILURES a transactional backend could not
                  land after retries (the engine routes them to the
                  audit as issue rows and keeps them OUT of the marker,
                  so they re-enter next run — gobulk records failed ops
                  as issues, issue.go:137-146)
- delete        — Delete: remove keys from prior runs' data

ParquetKeptSink is the default (run=<id>/lang=<l> directory layout,
atomic swap deletes via lineage/fsutil; write is all-or-nothing, task
retry is Spark's tier, so it never returns partial failures).
MemoryKeptSink proves the seam with a second storage-free backend;
UnreliableMemoryKeptSink is the third — a transactional per-item
backend with injectable faults exercising the ES retry contract
(429-backoff x15, conflict-retry x3, delete-404-is-success,
output/elasticsearch.go:309-320,343-360). PartitionedRetrySink is the
fourth and the PRODUCTION shape of that contract: the same retry loop
run executor-side inside one mapInPandas job, failures staged to
parquet and read back — row data never crosses the driver.
txlog.TxLogKeptSink is the fifth: a from-scratch transaction-log table
format (atomic rename commits, snapshot isolation, MERGE-shaped
deletes, time travel) standing in for the environment-gated
Iceberg/Delta backend. The e2e suite passes against all of them
(tests/test_sinks.py, tests/test_retry_sink.py,
tests/test_partitioned_sink.py, tests/test_txlog_sink.py).
"""

from __future__ import annotations

import time
from typing import Callable, Protocol

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import lineage


class SinkSchemaMismatch(Exception):
    """The live store's schema deep-diffs against the declared one."""


#: schema of a sink's per-item write failures, whichever form the
#: backend returns them in (list-of-dicts from the driver-side test
#: doubles; a staged-parquet-backed DataFrame from PartitionedRetrySink)
FAILURE_SCHEMA_DDL = (
    "image_id string, source_file string, content_hash string, "
    "payload string, error_msg string, attempts int"
)


def _put_with_retries(
    item: dict,
    fault: Callable[[dict, int], str | None],
    max_transient: int,
    max_conflict: int,
    backoff_s: float,
    log: Callable[[str, int, str], None] | None = None,
) -> tuple[bool, str | None, int]:
    """One item through the full ES-shaped retry budget: 429-shaped
    transients retry up to ``max_transient`` times with backoff,
    409-shaped conflicts up to ``max_conflict``, anything else fails
    immediately (output/elasticsearch.go:309-320,343-360). Returns
    (landed, error_msg, attempts). Pure function of the fault script —
    runs identically on the driver (UnreliableMemoryKeptSink) and
    inside an executor partition (PartitionedRetrySink)."""
    transient = conflict = 0
    attempt = 0
    while True:
        attempt += 1
        status = fault(item, attempt)
        if log is not None:
            log(item["image_id"], attempt, status or "ok")
        if status is None:
            return True, None, attempt
        if status == "transient":
            transient += 1
            if transient > max_transient:
                return False, "transient failure: retries exhausted", attempt
            time.sleep(backoff_s)
        elif status == "conflict":
            conflict += 1
            if conflict > max_conflict:
                return False, "version conflict: retries exhausted", attempt
        else:  # permanent — no retry, straight to the issue row
            return False, f"permanent failure: {status}", attempt


class KeptSink(Protocol):
    def validate(self, spark: SparkSession, schema_ddl: str) -> None: ...

    def recover(self, spark: SparkSession) -> None: ...

    def existing_ids(
        self, spark: SparkSession, exclude_run_id: str
    ) -> DataFrame | None: ...

    def write(self, df: DataFrame, run_id: str) -> list[dict] | None: ...

    def delete(self, spark: SparkSession, run_id: str, keys: DataFrame) -> None: ...

    def read(self, spark: SparkSession) -> DataFrame | None: ...


def _diff_schema(declared: dict[str, str], live: dict[str, str]) -> str | None:
    """Deep field-by-field diff (name -> normalized type); None if equal.

    The live store may carry extra PHYSICAL columns the layout adds
    (e.g. the run= partition key) — those are declared by the caller.
    Anything else — missing, extra, or re-typed — is a hard setup
    error, reported in full so the operator sees every divergence at
    once, not one per run (gobulk prints the whole diff,
    output/elasticsearch.go:153-158)."""
    problems = []
    for name, typ in declared.items():
        if name not in live:
            problems.append(f"missing column: {name} {typ}")
        elif live[name] != typ:
            problems.append(f"type mismatch: {name} is {live[name]}, declared {typ}")
    for name in live:
        if name not in declared:
            problems.append(f"unexpected column: {name} {live[name]}")
    return "; ".join(problems) if problems else None


def _ddl_to_fields(spark: SparkSession, ddl: str) -> dict[str, str]:
    from pyspark.sql.types import StructType

    return {f.name: f.dataType.simpleString() for f in StructType.fromDDL(ddl)}


class ParquetKeptSink:
    """Default sink: per-run parquet dirs partitioned by lang, deletes
    as staged rewrite + atomic swap (Iceberg-MERGE shaped)."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir

    def validate(self, spark: SparkSession, schema_ddl: str) -> None:
        """Fail fast (with the full diff) if the live kept store was
        written under a different schema — BEFORE any write, so a store
        from an older engine version is rejected instead of silently
        unioned by the next read."""
        live_df = lineage.read_kept(spark, self.out_dir)
        if live_df is None:
            return  # empty store: this run establishes the schema
        declared = _ddl_to_fields(spark, schema_ddl)
        declared["run"] = "string"  # physical partition key of the layout
        live = {f.name: f.dataType.simpleString() for f in live_df.schema.fields}
        diff = _diff_schema(declared, live)
        if diff:
            raise SinkSchemaMismatch(
                f"kept store at {lineage.kept_dir(self.out_dir)} does not "
                f"match the declared schema: {diff}"
            )

    def recover(self, spark: SparkSession) -> None:
        lineage.recover_kept_swaps(spark, self.out_dir)

    def existing_ids(self, spark: SparkSession, exclude_run_id: str) -> DataFrame | None:
        return lineage.prior_kept_ids(spark, self.out_dir, exclude_run_id)

    def write(self, df: DataFrame, run_id: str) -> list[dict] | None:
        # all-or-nothing: a failed Spark write raises (task retry is the
        # executor tier), so there are never per-item partial failures
        df.write.mode("overwrite").partitionBy("lang").parquet(
            f"{lineage.kept_dir(self.out_dir)}/run={run_id}"
        )
        return None

    def delete(self, spark: SparkSession, run_id: str, keys: DataFrame) -> None:
        lineage.delete_keys_from_prior_runs(spark, self.out_dir, run_id, keys)

    def read(self, spark: SparkSession) -> DataFrame | None:
        return lineage.read_kept(spark, self.out_dir)


class MemoryKeptSink:
    """In-memory sink (tests / notebooks): per-run pandas frames.

    Collects to the driver — NOT a scale path; it exists to prove the
    Output seam with a second, storage-free backend (gobulk's test
    output analogue, runner_test.go's in-memory output)."""

    def __init__(self):
        self.runs: dict[str, pd.DataFrame] = {}

    def validate(self, spark: SparkSession, schema_ddl: str) -> None:
        declared = _ddl_to_fields(spark, schema_ddl)
        for rid, f in self.runs.items():
            if not f.empty and (missing := set(declared) - set(f.columns)):
                raise SinkSchemaMismatch(
                    f"run {rid} lacks declared columns {sorted(missing)}"
                )

    def recover(self, spark: SparkSession) -> None:
        pass  # writes are atomic dict assignments

    def existing_ids(self, spark: SparkSession, exclude_run_id: str) -> DataFrame | None:
        frames = [df for rid, df in self.runs.items() if rid != exclude_run_id]
        # a prior run that kept ZERO rows leaves an empty frame —
        # createDataFrame cannot infer a schema from it
        if not frames or all(f.empty for f in frames):
            return None
        ids = pd.concat(frames)["image_id"].drop_duplicates()
        return spark.createDataFrame(ids.to_frame(), schema="image_id string")

    def write(self, df: DataFrame, run_id: str) -> list[dict] | None:
        self.runs[run_id] = df.toPandas()
        return None

    def delete(self, spark: SparkSession, run_id: str, keys: DataFrame) -> None:
        drop = {r["image_id"] for r in keys.select("image_id").distinct().collect()}
        for rid in list(self.runs):
            if rid != run_id:
                f = self.runs[rid]
                self.runs[rid] = f[~f["image_id"].isin(drop)].reset_index(drop=True)

    def read(self, spark: SparkSession) -> DataFrame | None:
        frames = [df.assign(run=rid) for rid, df in self.runs.items() if not df.empty]
        if not frames:
            return None
        return spark.createDataFrame(pd.concat(frames, ignore_index=True))


class UnreliableMemoryKeptSink(MemoryKeptSink):
    """Transactional per-item backend with injectable faults — the third
    sink, proving the remote-store retry contract without any jars.

    gobulk's Elasticsearch output retries a 429'd bulk chunk up to 15
    times with backoff, retries version-conflicted items 3 times, treats
    delete-of-absent (404) as success, and records everything else as a
    per-item issue with the payload attached
    (output/elasticsearch.go:309-320,343-360; gorm.go:201-218 detects
    0-rows-affected). ``fault(item, attempt)`` returns None (ok),
    "transient" (429-shaped: whole remaining chunk retried),
    "conflict" (409-shaped: that item retried), or "permanent"
    (400-shaped: no retry) — tests script failure sequences with it.

    Scale note: this is deliberately a driver-side test double (like
    MemoryKeptSink) — useful because its ``attempt_log`` and driver-side
    fault closures make retry sequences scriptable and inspectable.
    PartitionedRetrySink below is the production form: the SAME
    ``_put_with_retries`` loop run inside each executor partition.
    """

    def __init__(
        self,
        fault: Callable[[dict, int], str | None] | None = None,
        max_transient_retries: int = 15,
        max_conflict_retries: int = 3,
        backoff_s: float = 0.0,
    ):
        super().__init__()
        self.fault = fault or (lambda item, attempt: None)
        self.max_transient_retries = max_transient_retries
        self.max_conflict_retries = max_conflict_retries
        self.backoff_s = backoff_s
        self.attempt_log: list[tuple[str, int, str]] = []

    def _put(self, item: dict) -> tuple[bool, str | None, int]:
        """(landed, error_msg, attempts) after the full retry budget."""
        return _put_with_retries(
            item,
            self.fault,
            self.max_transient_retries,
            self.max_conflict_retries,
            self.backoff_s,
            log=lambda i, a, s: self.attempt_log.append((i, a, s)),
        )

    def write(self, df: DataFrame, run_id: str) -> list[dict] | None:
        items = df.toPandas()
        landed, failures = [], []
        for item in items.to_dict("records"):
            ok, err, attempts = self._put(item)
            if ok:
                landed.append(item)
            else:
                failures.append(
                    {
                        "image_id": item["image_id"],
                        "source_file": item.get("source_file"),
                        "content_hash": item.get("content_hash"),
                        "error_msg": err,
                        # NULL captions stay NULL, matching the
                        # executor-side failures-frame contract
                        "payload": (
                            None
                            if item.get("caption") is None
                            else str(item["caption"])
                        ),
                        "attempts": attempts,
                    }
                )
        # rebuild with the source frame's dtypes: the dict round-trip
        # widens int32->int64, and the seam contract is byte-identical
        # kept rows across backends (tests compare frames exactly)
        self.runs[run_id] = (
            pd.DataFrame(landed, columns=items.columns).astype(
                items.dtypes.to_dict()
            )
            if landed
            else items.iloc[0:0]
        )
        return failures or None

    def delete(self, spark: SparkSession, run_id: str, keys: DataFrame) -> None:
        # delete-of-absent is SUCCESS (ES 404 contract) — the base
        # implementation's isin() filter is naturally idempotent; this
        # override exists to document the contract and log attempts
        for r in keys.select("image_id").distinct().collect():
            self.attempt_log.append((r["image_id"], 1, "delete"))
        super().delete(spark, run_id, keys)


def _make_partition_writer(
    kept_run_dir: str,
    fault: Callable[[dict, int], str | None],
    max_transient: int,
    max_conflict: int,
    backoff_s: float,
    arrow_schema,
):
    """Executor-side writer for PartitionedRetrySink.write's single
    mapInPandas job: run the bounded per-item retry loop over this
    partition's own rows, land accepted rows as parquet files under the
    ParquetKeptSink layout, yield ONLY the per-item failures.

    File names are deterministic per (partition, batch, lang): a
    retried or speculative task overwrites its own output instead of
    duplicating it (the idempotence a remote bulk API gets from
    write-by-id)."""

    def write_partition(batches):
        import os as _os

        import pyarrow as _pa
        import pyarrow.parquet as _pq
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        # taskAttemptId is unique per ATTEMPT across the job: two
        # concurrent attempts of the same task (speculative execution)
        # each write their own temp file and the os.replace rename is
        # atomic, so the deterministic final path never holds a torn
        # file — last rename wins with identical content
        attempt = ctx.taskAttemptId()
        for seq, batch in enumerate(batches):
            landed_mask: list[bool] = []
            fails: list[dict] = []
            for item in batch.to_dict("records"):
                ok, err, attempts = _put_with_retries(
                    item, fault, max_transient, max_conflict, backoff_s
                )
                landed_mask.append(ok)
                if not ok:
                    cap = item.get("caption")
                    fails.append(
                        {
                            "image_id": item["image_id"],
                            "source_file": item.get("source_file"),
                            "content_hash": item.get("content_hash"),
                            # NULL captions stay NULL in the failures
                            # frame (driver-side sinks preserve them; a
                            # str() here would land the literal "None")
                            "payload": None if cap is None else str(cap),
                            "error_msg": err,
                            "attempts": attempts,
                        }
                    )
            landed = batch[pd.Series(landed_mask, index=batch.index)]
            if len(landed):
                # lang is a PARTITION column of the store layout: encode
                # it in the directory, never in the file (a column
                # present in both breaks partition discovery)
                for lang_val, grp in landed.groupby("lang", dropna=False):
                    leaf = (
                        "lang=__HIVE_DEFAULT_PARTITION__"
                        if pd.isna(lang_val)
                        else f"lang={lang_val}"
                    )
                    d = _os.path.join(kept_run_dir, leaf)
                    _os.makedirs(d, exist_ok=True)
                    # the EXPLICIT schema matters: without it pyarrow
                    # infers types from the pandas group, and an
                    # all-None string column in one batch would land a
                    # NULL-typed parquet file that breaks the store's
                    # schema merge on the next read
                    final = _os.path.join(d, f"part-{pid:05d}-{seq:04d}.parquet")
                    # dot-PREFIXED temp name: Spark's parquet reader
                    # skips hidden files, so a tmp leaked by a killed
                    # attempt (crash between write and rename) can
                    # never poison a later read of the store — a
                    # 'part-*.tmp' suffix would be scanned as data
                    tmp = _os.path.join(
                        d, f".part-{pid:05d}-{seq:04d}.{attempt}.tmp"
                    )
                    _pq.write_table(
                        _pa.Table.from_pandas(
                            grp.drop(columns=["lang"]),
                            schema=arrow_schema,
                            preserve_index=False,
                        ),
                        tmp,
                    )
                    _os.replace(tmp, final)
            if fails:
                f = pd.DataFrame(fails)
                f["attempts"] = f["attempts"].astype("int32")
                yield f

    return write_partition


class PartitionedRetrySink(ParquetKeptSink):
    """Production-shaped remote-store sink: the ES retry contract run
    EXECUTOR-SIDE, each partition retrying its own chunk.

    gobulk's Elasticsearch output retries bulk chunks where the data
    is (output/elasticsearch.go:231-320,343-360); the driver-side
    UnreliableMemoryKeptSink proves that contract as a test double and
    documents this class as its production shape. ``write`` is ONE
    Spark job: ``df.mapInPandas`` runs the bounded retry loop
    (transient x``max_transient_retries`` + backoff, conflict
    x``max_conflict_retries``, permanent -> fail) inside each
    partition, lands accepted rows as parquet files under the inherited
    ParquetKeptSink layout (run=<rid>/lang=<l>), and yields only the
    per-item failures, which are staged to ``_sink_failures/run=<rid>``
    and read back as the failures DataFrame the engine joins against.
    Row data never round-trips through the driver (pinned by
    tests/test_partitioned_sink.py poisoning collect/toPandas).

    validate/recover/existing_ids/delete/read are inherited — the
    storage is the same kept store; only the write path differs.

    Scale notes: kept files are written with pyarrow against a
    filesystem path (local in this sandbox; a real deployment points
    ``out_dir`` at a fuse/NFS mount or swaps the two ``_pq.write_table``
    calls for a pyarrow.fs S3/HDFS handle — the job shape is
    unchanged). The failures staging keeps wholesale failure off the
    driver: an epoch where every row fails yields a large failures
    frame that lives entirely in parquet.

    Concurrency contract: the per-attempt temp + atomic rename keeps
    racing task attempts from TEARING a file, and with a
    DETERMINISTIC per-(item, attempt) outcome — the write-by-id
    idempotent remote store this class models — racing attempts land
    identical content, so last-rename-wins is safe. If the remote
    outcome is NONDETERMINISTIC across attempts, a speculative
    duplicate attempt could land a file disagreeing with the committed
    attempt's failures frame; run such sinks with
    ``spark.speculation=false`` (the Spark default) so exactly one
    attempt's loop decides both the file and the frame."""

    def __init__(
        self,
        out_dir: str,
        fault: Callable[[dict, int], str | None] | None = None,
        max_transient_retries: int = 15,
        max_conflict_retries: int = 3,
        backoff_s: float = 0.0,
        failure_staging_ttl_s: float = 3600.0,
    ):
        super().__init__(out_dir)
        self.fault = fault or (lambda item, attempt: None)
        self.max_transient_retries = max_transient_retries
        self.max_conflict_retries = max_conflict_retries
        self.backoff_s = backoff_s
        self.failure_staging_ttl_s = failure_staging_ttl_s

    def _failures_dir(self, run_id: str) -> str:
        return lineage._join(self.out_dir, "_sink_failures", f"run={run_id}")

    def write(self, df: DataFrame, run_id: str):
        spark = df.sparkSession
        kept_run_dir = f"{lineage.kept_dir(self.out_dir)}/run={run_id}"
        # per-run overwrite contract: a retried write replaces its own
        # earlier (possibly torn) attempt before re-landing
        from .fsutil import Fs

        fs = Fs(spark, self.out_dir)
        fs.delete(kept_run_dir)
        # prune consumed failure stagings (same discipline as the retry
        # queue): by the time a NEW run writes, a prior SERIAL epoch's
        # failures frame has been materialized into the audit + retry
        # queue, so its run= dir is dead weight that would otherwise
        # grow without bound on a long-lived streaming out_dir. The TTL
        # guards the concurrent-runs case: a dir younger than
        # ``failure_staging_ttl_s`` may belong to another run still
        # between staging and consuming its failures frame (a lazy
        # parquet read), so only aged-out dirs are reclaimed
        import time as _time

        froot = lineage._join(self.out_dir, "_sink_failures")
        if fs.exists(froot):
            now = _time.time()
            for d in fs.listdir(froot):
                if not d.startswith("run=") or d == f"run={run_id}":
                    continue
                m = fs.mtime(lineage._join(froot, d))
                # mtime 0 = the store reports no time for this path
                # (object-store synthetic dirs): UNKNOWN age must read
                # as young, never as ancient — deleting on it would
                # reopen the concurrent-run race the TTL exists to close
                if m > 0 and now - m >= self.failure_staging_ttl_s:
                    fs.delete(lineage._join(froot, d))
        # the declared schema (minus the directory-encoded lang column)
        # rides into every executor write — file types never drift from
        # the store even when a batch group is all-null in a column
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        full = to_arrow_schema(df.schema)
        arrow_schema = pa.schema([f for f in full if f.name != "lang"])
        writer = _make_partition_writer(
            kept_run_dir,
            self.fault,
            self.max_transient_retries,
            self.max_conflict_retries,
            self.backoff_s,
            arrow_schema,
        )
        failures = df.mapInPandas(writer, schema=FAILURE_SCHEMA_DDL)
        fail_dir = self._failures_dir(run_id)
        # the ONE action: kept rows land as the job's side output,
        # failures as its result set — staged, never driver-collected
        failures.write.mode("overwrite").parquet(fail_dir)
        fdf = spark.read.schema(FAILURE_SCHEMA_DDL).parquet(fail_dir)
        if fdf.isEmpty():
            return None
        return fdf
