"""Streaming ingest: AvailableNow drain + restart picks up only new files."""

from __future__ import annotations

import os
import shutil

import pyarrow.parquet as pq
import pytest

from gobulk_spark import lineage
from gobulk_spark.config import PipelineConfig
from gobulk_spark.corpus import generate_pairs
from gobulk_spark.streaming.incremental import run_streaming_ingest

SRC = "/tmp/gobulk_spark_test_corpora/stream_src"
OUT = "/tmp/gobulk_spark_test_out/stream"


def _write_file(table, name):
    os.makedirs(SRC, exist_ok=True)
    pq.write_table(table, os.path.join(SRC, name))


def test_streaming_ingest_and_restart(spark):
    shutil.rmtree(SRC, ignore_errors=True)
    shutil.rmtree(OUT, ignore_errors=True)
    pairs, _ = generate_pairs(600, seed=42)
    _write_file(pairs.slice(0, 300), "part-000.parquet")
    _write_file(pairs.slice(300, 300), "part-001.parquet")

    cfg = PipelineConfig(source_path=SRC, out_dir=OUT, run_id="s1")
    run_streaming_ingest(spark, cfg, SRC)
    audit = lineage.read_audit(spark, OUT).toPandas()
    assert len(audit) == 600
    assert audit["image_id"].is_unique

    # new file appears; AvailableNow restart processes only it
    pairs2, _ = generate_pairs(800, seed=42)
    _write_file(pairs2.slice(600, 200), "part-002.parquet")
    run_streaming_ingest(spark, cfg, SRC)
    audit2 = lineage.read_audit(spark, OUT).toPandas()
    assert len(audit2) == 800
    assert audit2["image_id"].is_unique
    kept = lineage.read_kept(spark, OUT).toPandas()
    create_ids = set(audit2.loc[audit2.action == "create", "image_id"])
    assert set(kept["image_id"]) == create_ids


def test_streaming_matches_batch_decisions(spark, corpus_1500, golden_1500):
    """The streaming path must produce the same keep/drop as batch/golden."""
    path, pairs, _ = corpus_1500
    out = "/tmp/gobulk_spark_test_out/stream_vs_batch"
    shutil.rmtree(out, ignore_errors=True)
    src = "/tmp/gobulk_spark_test_corpora/stream_vs_batch_src"
    shutil.rmtree(src, ignore_errors=True)
    os.makedirs(src)
    shutil.copy(path, os.path.join(src, "pairs.parquet"))
    cfg = PipelineConfig(source_path=src, out_dir=out, run_id="s1")
    run_streaming_ingest(spark, cfg, src)
    audit = lineage.read_audit(spark, out).toPandas()
    m = audit.merge(golden_1500, on="image_id")
    spark_keep = m["action"] == "create"
    assert (spark_keep == m["keep"]).all()
