"""Physical-plan contracts — guards against scale regressions.

These assert the plan properties that matter at 100 TB: column pruning
into the parquet scan, broadcast (not shuffle) joins for the dup list,
and exactly one wide exchange in the parse job (the deliberate salted
repartition).
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from gobulk_spark.config import PipelineConfig
from gobulk_spark.pipeline import _salted_repartition
from gobulk_spark.sources import scan as src_scan
from gobulk_spark.stages import PARSE_OUTPUT_SCHEMA, make_parse_stage


@pytest.fixture(scope="module")
def src(spark, corpus_1500):
    path, _, _ = corpus_1500
    return src_scan.read_source(spark, path)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_dedup_scan_prunes_to_three_columns(src):
    plan = _plan(src_scan.find_duplicates(src))
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert scans, plan
    for s in scans:
        # only the hash inputs are read; bytes never shuffles, and w/h/
        # fmt/phash are pruned away entirely
        assert "image_id" in s and "bytes" in s and "caption" in s
        assert "phash" not in s and "fmt" not in s


def test_dup_removal_is_broadcast_anti_join(spark, src):
    dups = spark.createDataFrame(pd.DataFrame({"image_id": ["img-00000001"]}))
    plan = _plan(src_scan.anti_join_ids(src, dups, broadcast=True))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_parse_job_has_exactly_one_wide_exchange(spark, src):
    dups = spark.createDataFrame(pd.DataFrame({"image_id": ["img-00000001"]}))
    cfg = PipelineConfig(source_path="x", out_dir="y")
    clean = src_scan.anti_join_ids(src, dups, broadcast=True)
    feats = _salted_repartition(clean, cfg, 8).mapInPandas(
        make_parse_stage(False), schema=PARSE_OUTPUT_SCHEMA
    )
    plan = _plan(feats)
    shuffles = [
        l
        for l in plan.splitlines()
        if "Exchange" in l and "BroadcastExchange" not in l and "Reused" not in l
    ]
    assert len(shuffles) == 1, plan  # the salted repartition, nothing else
    assert "REPARTITION_BY_NUM" in shuffles[0]
    assert "pmod(phash" in shuffles[0]


def test_decision_chain_stays_in_codegen(spark, corpus_1500):
    """The plan stage is pure Column exprs — whole-stage codegen, no
    Python evaluation nodes."""
    from gobulk_spark.plan import decision_columns
    from gobulk_spark.rules import DEFAULT_THRESHOLDS

    path, _, _ = corpus_1500
    feats = src_scan.read_source(spark, path).limit(10)
    feats = feats.mapInPandas(make_parse_stage(False), schema=PARSE_OUTPUT_SCHEMA)
    decided = decision_columns(feats, DEFAULT_THRESHOLDS)
    plan = _plan(decided)
    # exactly one python node (the parse stage); the decision adds none
    assert plan.count("MapInPandas") == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_binary_column_absent_downstream_of_parse(spark, src):
    cfg = PipelineConfig(source_path="x", out_dir="y")
    feats = _salted_repartition(src, cfg, 8).mapInPandas(
        make_parse_stage(False), schema=PARSE_OUTPUT_SCHEMA
    )
    assert "bytes" not in feats.columns
    from gobulk_spark.plan import decision_columns
    from gobulk_spark.rules import DEFAULT_THRESHOLDS

    assert "bytes" not in decision_columns(feats, DEFAULT_THRESHOLDS).columns

def test_lsh_self_join_reuses_pinned_intermediate(spark):
    """The signature/shingle frame must be computed once and read from
    cache by the guard + both self-join sides — without the pin the
    corpus-wide map work executes once per consumer (4 scans observed)."""
    from gobulk_spark.operators.dedup import minhash_lsh_candidates

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = minhash_lsh_candidates(d, "doc_id", "text", 8, 2, max_bucket_size=64)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("InMemoryTableScan") >= 3  # guard + join left + join right
