"""PartitionedRetrySink: the ES retry contract run executor-side.

Round-3 VERDICT #1: move the per-item retry loop (transient x15 +
backoff, conflict x3, per-item issue capture) from the driver-side test
double into the executors via one mapInPandas job, with failures staged
to a per-run parquet dir and read back — no driver round-trip of row
data. The reference retries bulk chunks where the data is
(output/elasticsearch.go:231-320,343-360).

Fault functions here are DETERMINISTIC AND STATELESS (keyed on the item
id's hex digits / the per-item attempt counter): they execute inside
executor partitions, where driver-side closure mutation is invisible.
"""

from __future__ import annotations

import os
import shutil

import pandas as pd
import pyarrow.parquet as pq
import pytest

from gobulk_spark import lineage
from gobulk_spark.config import PipelineConfig
from gobulk_spark.pipeline import run_pipeline
from gobulk_spark.sinks import ParquetKeptSink, PartitionedRetrySink

BASE = "/tmp/gobulk_spark_test_out/partitioned_sink"


def _src(n=200, seed=13) -> str:
    from gobulk_spark.corpus import generate_pairs

    os.makedirs(BASE, exist_ok=True)
    pairs, _ = generate_pairs(n, seed=seed)
    path = os.path.join(BASE, "src.parquet")
    pq.write_table(pairs, path)
    return path


def _poisoned(iid: str, mod=7) -> bool:
    """Driver-side assertion helper ONLY. Executor-side fault closures
    must inline this expression: a reference to a test-module global
    pickles by module name, which executors cannot import."""
    return int(iid.split("-")[-1], 16) % mod == 0


def test_healthy_write_matches_parquet_sink_exactly(spark):
    """With no faults the partitioned sink's store must be byte-for-row
    identical to ParquetKeptSink's — same layout, same dtypes, same
    partition columns — across a create run AND an update/delete run."""
    shutil.rmtree(BASE, ignore_errors=True)
    src = _src()
    out_a, out_b = os.path.join(BASE, "a"), os.path.join(BASE, "b")
    for out, sink_cls in ((out_a, PartitionedRetrySink), (out_b, ParquetKeptSink)):
        run_pipeline(
            spark,
            PipelineConfig(source_path=src, out_dir=out, run_id="r1"),
            sink=sink_cls(out),
        )
    ka = lineage.read_kept(spark, out_a)
    kb = lineage.read_kept(spark, out_b)
    assert [f.simpleString() for f in sorted(ka.schema, key=lambda f: f.name)] == [
        f.simpleString() for f in sorted(kb.schema, key=lambda f: f.name)
    ]
    cols = sorted(ka.columns)
    pa_df = ka.select(cols).toPandas().sort_values("image_id").reset_index(drop=True)
    pb_df = kb.select(cols).toPandas().sort_values("image_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(pa_df, pb_df)
    # second (incremental) run over re-delivered content exercises the
    # inherited delete/update path against pyarrow-written leaves
    for out, sink_cls in ((out_a, PartitionedRetrySink), (out_b, ParquetKeptSink)):
        run_pipeline(
            spark,
            PipelineConfig(source_path=src, out_dir=out, run_id="r2"),
            sink=sink_cls(out),
        )
    pa2 = (
        lineage.read_kept(spark, out_a)
        .select(cols)
        .toPandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    pb2 = (
        lineage.read_kept(spark, out_b)
        .select(cols)
        .toPandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(pa2, pb2)
    assert pa2["image_id"].is_unique


def test_transient_faults_retry_to_success_executor_side(spark):
    """Every item 429s twice then lands (attempt counter is per item,
    maintained inside the partition): zero failures, full store."""
    shutil.rmtree(BASE, ignore_errors=True)
    src = _src(120, seed=14)
    out = os.path.join(BASE, "out")

    sink = PartitionedRetrySink(
        out, fault=lambda item, attempt: "transient" if attempt <= 2 else None
    )
    run_pipeline(
        spark, PipelineConfig(source_path=src, out_dir=out, run_id="r1"), sink=sink
    )
    audit = lineage.read_audit(spark, out).toPandas()
    assert (audit["issue_type"] == "output_write").sum() == 0
    kept = lineage.read_kept(spark, out).toPandas()
    exec_kept = set(audit.loc[audit.action.isin(["create", "update"]), "image_id"])
    assert set(kept.image_id) == exec_kept and exec_kept


def test_permanent_failures_stage_reenter_and_heal(spark):
    """Deterministically-poisoned items fail executor-side, come back
    as a parquet-backed failures frame (never a list), land as audit
    issues, stay out of marker AND manifest, and are re-imported by the
    next incremental run once a healthy sink replaces the faulty one."""
    shutil.rmtree(BASE, ignore_errors=True)
    src = _src()
    out = os.path.join(BASE, "out")

    def fault(item, attempt):
        return (
            "permanent"
            if int(item["image_id"].split("-")[-1], 16) % 7 == 0
            else None
        )

    sink = PartitionedRetrySink(out, fault=fault)
    run_pipeline(
        spark, PipelineConfig(source_path=src, out_dir=out, run_id="r1"), sink=sink
    )
    kept = lineage.read_kept(spark, out).toPandas()
    assert not any(_poisoned(i) for i in kept.image_id)
    audit = lineage.read_audit(spark, out).toPandas()
    issues = audit[audit.issue_type == "output_write"]
    victims = set(issues.image_id)
    assert victims and all(_poisoned(i) for i in victims)
    assert issues.error_msg.str.contains(r"permanent failure.*\(attempts=1\)").all()
    assert issues.payload.notna().all()
    # the failures landed in the staging dir, not on the driver
    assert os.path.isdir(os.path.join(out, "_sink_failures", "run=r1"))
    marker = lineage.processed_keys(spark, out)
    assert not victims & {r["image_id"] for r in marker.collect()}
    # heal: a fresh, fault-free sink instance over the same store
    s2 = run_pipeline(
        spark,
        PipelineConfig(source_path=src, out_dir=out, run_id="r2", incremental=True),
        sink=PartitionedRetrySink(out),
    )
    assert s2["phases"]["store"]["rows_in"] == len(victims)
    kept2 = lineage.read_kept(spark, out).toPandas()
    assert victims <= set(kept2.image_id)
    assert kept2["image_id"].is_unique


def test_conflict_budget_bounded_executor_side(spark):
    """Conflicts clear on attempt 2 for one id class and never for
    another: the first lands, the second fails after 1+3 attempts with
    the bounded-retry message."""
    shutil.rmtree(BASE, ignore_errors=True)
    src = _src(150, seed=15)
    out = os.path.join(BASE, "out")

    def fault(item, attempt):
        h = int(item["image_id"].split("-")[-1], 16)
        if h % 5 == 0:  # clears on the 2nd attempt
            return "conflict" if attempt == 1 else None
        if h % 5 == 1:  # never clears
            return "conflict"
        return None

    sink = PartitionedRetrySink(out, fault=fault, max_conflict_retries=3)
    run_pipeline(
        spark, PipelineConfig(source_path=src, out_dir=out, run_id="r1"), sink=sink
    )
    audit = lineage.read_audit(spark, out).toPandas()
    failed = audit[audit.issue_type == "output_write"]
    kept_ids = set(lineage.read_kept(spark, out).toPandas().image_id)
    h = lambda i: int(i.split("-")[-1], 16)  # noqa: E731
    assert all(hh % 5 == 1 for hh in map(h, failed.image_id))
    assert failed.error_msg.str.contains(r"version conflict.*\(attempts=4\)").all()
    # every decided-kept id outside the never-clears class landed
    exec_kept = set(audit.loc[audit.action.isin(["create", "update"]), "image_id"])
    assert {i for i in exec_kept if h(i) % 5 != 1} == kept_ids


def test_write_never_round_trips_rows_through_driver(spark, monkeypatch):
    """The plan-shaped contract: sink.write must not materialize row
    data on the driver. collect/toPandas/toLocalIterator are poisoned
    for the duration of the call — the single mapInPandas job plus the
    staged-parquet failure read-back must be enough."""
    from pyspark.sql import DataFrame

    shutil.rmtree(BASE, ignore_errors=True)
    src = _src(80, seed=16)
    out = os.path.join(BASE, "out")

    from gobulk_spark.corpus import generate_pairs  # noqa: F401
    from gobulk_spark.pipeline import KEPT_COLUMNS
    from gobulk_spark.sources import scan as src_scan
    from gobulk_spark.stages import PARSE_OUTPUT_SCHEMA, make_parse_stage
    from gobulk_spark.plan import decision_columns
    from gobulk_spark.config import PipelineConfig as _Cfg

    cfg = _Cfg(source_path=src, out_dir=out, run_id="r1")
    feats = src_scan.with_content_hash(
        src_scan.read_source(spark, src)
    ).mapInPandas(make_parse_stage(False), schema=PARSE_OUTPUT_SCHEMA)
    decided = decision_columns(feats, cfg.thresholds)
    from pyspark.sql import functions as F

    kept = (
        decided.where(F.col("action").isin("update", "create", "omit"))
        .where(F.col("keep"))
        .withColumn("caption", F.col("scrubbed_caption"))
        .select(*KEPT_COLUMNS)
    )

    def fault(item, attempt):
        return (
            "permanent"
            if int(item["image_id"].split("-")[-1], 16) % 6 == 0
            else None
        )

    sink = PartitionedRetrySink(out, fault=fault)

    def boom(self, *a, **k):
        raise AssertionError("driver round-trip of row data")

    monkeypatch.setattr(DataFrame, "collect", boom)
    monkeypatch.setattr(DataFrame, "toPandas", boom)
    monkeypatch.setattr(DataFrame, "toLocalIterator", boom)
    failures = sink.write(kept, "r1")
    monkeypatch.undo()
    assert failures is not None and isinstance(failures, DataFrame)
    f = failures.toPandas()
    assert len(f) and all(_poisoned(i, mod=6) for i in f.image_id)
    landed = lineage.read_kept(spark, out).toPandas()
    assert not any(_poisoned(i, mod=6) for i in landed.image_id)


def test_write_is_idempotent_per_run_scope(spark):
    """A retried write replaces its own earlier attempt: same run id
    written twice (faulty, then healthy) leaves exactly one copy of
    each row and an empty failures result the second time."""
    shutil.rmtree(BASE, ignore_errors=True)
    src = _src(100, seed=17)
    out = os.path.join(BASE, "out")

    def fault(item, attempt):
        return (
            "permanent"
            if int(item["image_id"].split("-")[-1], 16) % 4 == 0
            else None
        )

    faulty = PartitionedRetrySink(out, fault=fault)
    run_pipeline(
        spark, PipelineConfig(source_path=src, out_dir=out, run_id="r1"), sink=faulty
    )
    k1 = lineage.read_kept(spark, out).toPandas()
    healthy = PartitionedRetrySink(out)
    # re-land the same run scope: materialize the rows FIRST — the
    # write's per-run cleanup deletes the very files a lazy read of the
    # store would scan (self-overwrite, unsupported in Spark generally)
    rows = lineage.read_kept(spark, out).drop("run").localCheckpoint(eager=True)
    assert healthy.write(rows, "r1") is None
    k2 = lineage.read_kept(spark, out).toPandas()
    assert k2["image_id"].is_unique
    assert set(k2.image_id) == set(k1.image_id)


def test_streaming_drain_with_partitioned_sink(spark):
    """The dead-letter retry queue composes with the executor-side
    sink: failed rows drain and land once a healthy sink replaces the
    faulty one on the next epoch."""
    from gobulk_spark.corpus import generate_pairs
    from gobulk_spark.streaming.incremental import run_streaming_ingest

    shutil.rmtree(BASE, ignore_errors=True)
    src_dir = os.path.join(BASE, "stream_src")
    out = os.path.join(BASE, "stream_out")
    os.makedirs(src_dir)
    pairs, _ = generate_pairs(120, seed=18)
    pq.write_table(pairs.slice(0, 60), os.path.join(src_dir, "part-000.parquet"))

    def fault(item, attempt):
        return (
            "permanent"
            if int(item["image_id"].split("-")[-1], 16) % 7 == 0
            else None
        )

    cfg = PipelineConfig(source_path=src_dir, out_dir=out, run_id="s1")
    run_streaming_ingest(spark, cfg, src_dir, sink=PartitionedRetrySink(out, fault=fault))
    audit = lineage.read_audit(spark, out).toPandas()
    victims = set(audit.loc[audit.issue_type == "output_write", "image_id"])
    assert victims
    kept = lineage.read_kept(spark, out)
    stored = set() if kept is None else set(kept.toPandas().image_id)
    assert not victims & stored
    pq.write_table(pairs.slice(60, 60), os.path.join(src_dir, "part-001.parquet"))
    run_streaming_ingest(spark, cfg, src_dir, sink=PartitionedRetrySink(out))
    kept2 = set(lineage.read_kept(spark, out).toPandas().image_id)
    assert victims <= kept2
    audit2 = lineage.read_audit(spark, out).toPandas()
    assert victims <= set(audit2.loc[audit2.action == "retry_landed", "image_id"])


def _kept_frame(spark, rows):
    from gobulk_spark.pipeline import KEPT_SCHEMA_DDL

    return spark.createDataFrame(rows, KEPT_SCHEMA_DDL)


def test_null_caption_payload_stays_null_in_failures(spark):
    """A permanently-failed row with a NULL caption must carry a NULL
    payload in the staged failures frame — the driver-side sinks (and
    failures_frame joins downstream) preserve NULLs, and a literal
    "None" string would diverge from them."""
    shutil.rmtree(BASE, ignore_errors=True)
    out = os.path.join(BASE, "out")
    kept = _kept_frame(
        spark,
        [
            ("a-0", "f", "h1", 8, 8, "png", 1, None, "en", 0.9, 5.0),
            ("b-1", "f", "h2", 8, 8, "png", 2, "real caption", "en", 0.9, 5.0),
        ],
    )
    sink = PartitionedRetrySink(out, fault=lambda item, attempt: "permanent")
    failures = sink.write(kept, "r1").toPandas().set_index("image_id")
    assert pd.isna(failures.loc["a-0", "payload"])
    assert failures.loc["b-1", "payload"] == "real caption"


def test_kept_files_land_atomically_no_tmp_left(spark):
    """Executor writes go to a per-attempt temp name and os.replace into
    the deterministic final path: after a write the store holds only
    final parquet leaves, never a *.tmp (the torn-file window under
    speculative execution closes at the rename)."""
    shutil.rmtree(BASE, ignore_errors=True)
    src = _src(80, seed=21)
    out = os.path.join(BASE, "out")
    run_pipeline(
        spark,
        PipelineConfig(source_path=src, out_dir=out, run_id="r1"),
        sink=PartitionedRetrySink(out),
    )
    leaves = []
    for root, _dirs, files in os.walk(lineage.kept_dir(out)):
        leaves.extend(files)
    assert leaves and not [f for f in leaves if f.endswith(".tmp")]
    assert all(f.endswith(".parquet") for f in leaves if not f.startswith("_"))


def test_sink_failures_staging_pruned_on_next_write(spark):
    """_sink_failures/run=<rid> dirs are consumed within their own epoch
    (audit + retry queue are materialized); the NEXT write prunes aged
    ones so a long-lived streaming out_dir doesn't grow without bound —
    but a dir YOUNGER than the TTL survives (it may belong to a
    concurrent run still between staging and consuming its frame)."""
    shutil.rmtree(BASE, ignore_errors=True)
    out = os.path.join(BASE, "out")
    rows = _kept_frame(
        spark, [("a-0", "f", "h1", 8, 8, "png", 1, "c", "en", 0.9, 5.0)]
    )
    faulty = PartitionedRetrySink(out, fault=lambda item, attempt: "permanent")
    assert faulty.write(rows, "r1") is not None
    froot = os.path.join(out, "_sink_failures")
    assert os.path.isdir(os.path.join(froot, "run=r1"))
    # default TTL: the fresh staging dir is NOT reclaimed
    guarded = PartitionedRetrySink(out)
    assert guarded.write(rows, "r2") is None
    assert os.path.isdir(os.path.join(froot, "run=r1"))
    # ttl=0 models the aged-out serial case: reclaimed on next write
    healthy = PartitionedRetrySink(out, failure_staging_ttl_s=0.0)
    assert healthy.write(rows, "r3") is None
    assert not os.path.isdir(os.path.join(froot, "run=r1"))
