"""End-to-end pipeline vs the single-node reference labeler.

The authoritative contracts (BASELINE.json): keep/drop F1 >= 0.99,
scrubbed-caption exact string match, PSNR >= 40 dB pixel invariance,
lineage completeness, resumability, issue routing.
"""

from __future__ import annotations

import glob
import os
import shutil

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gobulk_spark import lineage
from gobulk_spark.config import PipelineConfig
from gobulk_spark.pipeline import run_pipeline

OUT = "/tmp/gobulk_spark_test_out/e2e"


@pytest.fixture(scope="module")
def run_result(spark, corpus_1500):
    path, _, _ = corpus_1500
    shutil.rmtree(OUT, ignore_errors=True)
    cfg = PipelineConfig(source_path=path, out_dir=OUT, run_id="r1")
    summary = run_pipeline(spark, cfg)
    audit = lineage.read_audit(spark, OUT).toPandas()
    kept = lineage.read_kept(spark, OUT).toPandas()
    return summary, audit, kept


def _merged(run_result, golden_1500):
    _, audit, kept = run_result
    g = golden_1500
    m = audit.merge(g, on="image_id", suffixes=("_spark", "_ref"))
    m["spark_keep"] = m["action"] == "create"
    return m, kept


def test_keep_drop_f1(run_result, golden_1500):
    m, _ = _merged(run_result, golden_1500)
    tp = (m.spark_keep & m.keep).sum()
    fp = (m.spark_keep & ~m.keep).sum()
    fn = (~m.spark_keep & m.keep).sum()
    f1 = 2 * tp / (2 * tp + fp + fn)
    assert f1 >= 0.99, f"F1={f1:.4f} (fp={fp}, fn={fn})"


def test_drop_reasons_match_exactly(run_result, golden_1500):
    m, _ = _merged(run_result, golden_1500)
    # audit rule_fired: 'dedup_content_hash' for dups; golden uses 'duplicate'
    spark_reason = m["rule_fired"].replace({"dedup_content_hash": "duplicate"})
    agree = (
        spark_reason.fillna("<KEEP>") == m["drop_reason_ref"].fillna("<KEEP>")
    )
    assert agree.mean() >= 0.99, m.loc[~agree, ["image_id", "rule_fired", "drop_reason_ref"]].head(20)


def test_scrubbed_caption_exact_match(run_result, golden_1500):
    _, kept = run_result[0], run_result[2]
    g = golden_1500.set_index("image_id")
    merged = run_result[2].merge(
        golden_1500[["image_id", "scrubbed_caption"]], on="image_id"
    )
    assert len(merged) == len(run_result[2])
    assert (merged["caption"] == merged["scrubbed_caption"]).all()


def test_model_scores_bit_equal(run_result, golden_1500):
    """Same shared core on both sides -> identical float64 scores."""
    merged = run_result[2].merge(
        golden_1500[["image_id", "lang", "lang_conf", "ppl"]],
        on="image_id",
        suffixes=("_spark", "_ref"),
    )
    assert (merged["lang_spark"] == merged["lang_ref"]).all()
    np.testing.assert_array_equal(
        merged["lang_conf_spark"].to_numpy(), merged["lang_conf_ref"].to_numpy()
    )
    np.testing.assert_array_equal(
        merged["ppl_spark"].to_numpy(), merged["ppl_ref"].to_numpy()
    )


def test_lineage_completeness(run_result, corpus_1500):
    """Every input row appears exactly once across kept ∪ dropped ∪ issues."""
    _, audit, kept = run_result
    _, pairs, _ = corpus_1500
    assert len(audit) == len(pairs)
    assert audit["image_id"].is_unique
    assert set(audit["image_id"]) == set(pairs["image_id"])
    by_action = audit.groupby("action").size()
    assert by_action.sum() == len(pairs)
    assert set(kept["image_id"]) == set(audit.loc[audit.action == "create", "image_id"])


def test_issue_routing(run_result, golden_1500, corpus_1500):
    """Undecodable images land in the audit as parse issues, never kept."""
    _, audit, kept = run_result
    _, _, planted = corpus_1500
    bad = set(planted.loc[planted.planted == "img_corrupt", "image_id"])
    issues = audit[audit.action == "issue"]
    assert set(issues["image_id"]) == bad
    assert (issues["phase"] == "parse").all()
    assert (issues["issue_type"] == "data_parsing").all()
    assert not kept["image_id"].isin(bad).any()


def test_pixel_invariance_psnr(corpus_1500):
    """Stored (lossy) pixels vs pristine originals: PSNR >= 40 dB.

    The corpus generator quantizes before encoding (the simulated lossy
    codec); decoding must recover those pixels exactly, and they must sit
    within the PSNR contract of the pristine synthetic image.
    """
    from gobulk_spark.functions.imaging import decode_png, psnr, synth_image

    _, pairs, planted = corpus_1500
    lossy = pairs.merge(planted, on="image_id")
    lossy = lossy[(lossy.fmt == "jpeg") & (lossy.planted == "clean")].head(50)
    assert len(lossy) >= 20
    for row in lossy.itertuples():
        i = int(row.image_id.split("-")[1], 16)
        pristine = synth_image(42 * 1_000_003 + i, row.w, row.h)
        decoded = decode_png(row.bytes)
        assert psnr(pristine, decoded) >= 40.0


def test_metrics_cover_all_rows(spark, run_result, corpus_1500):
    _, pairs, _ = corpus_1500
    m = spark.read.parquet(lineage.metrics_dir(OUT)).toPandas()
    n_dups = run_result[0]["phases"]["scan"]["n_dups"]
    assert m["rows_in"].sum() == len(pairs) - n_dups
    assert (m["rows_in"] == m.rows_kept + m.rows_dropped + m.rows_issued).all()
    # salted repartition spreads work: no partition holds >30% of rows
    assert m["rows_in"].max() / m["rows_in"].sum() < 0.30


def test_resume_skips_committed_phases(spark, corpus_1500):
    path, _, _ = corpus_1500
    out = "/tmp/gobulk_spark_test_out/resume"
    shutil.rmtree(out, ignore_errors=True)
    cfg = PipelineConfig(source_path=path, out_dir=out, run_id="r1")
    s1 = run_pipeline(spark, cfg)
    kept1 = lineage.read_kept(spark, out).toPandas().sort_values("image_id")
    # second invocation: all three phases must come back from checkpoints
    s2 = run_pipeline(spark, cfg)
    assert s2["phases"]["scan"]["committed_at"] == s1["phases"]["scan"]["committed_at"]
    assert s2["phases"]["store"]["committed_at"] == s1["phases"]["store"]["committed_at"]
    assert s2["wall_s"] < s1["wall_s"] / 2
    # now sabotage the store checkpoint (simulates a crash mid-store):
    os.remove(os.path.join(out, "_checkpoint", "r1", "store.json"))
    s3 = run_pipeline(spark, cfg)
    assert s3["phases"]["parse"]["committed_at"] == s1["phases"]["parse"]["committed_at"]
    assert s3["phases"]["store"]["committed_at"] != s1["phases"]["store"]["committed_at"]
    kept3 = lineage.read_kept(spark, out).toPandas().sort_values("image_id")
    pd.testing.assert_frame_equal(
        kept1.reset_index(drop=True), kept3.reset_index(drop=True)
    )


def test_stop_on_error_raises(spark, corpus_1500):
    path, _, _ = corpus_1500
    out = "/tmp/gobulk_spark_test_out/stoponerror"
    shutil.rmtree(out, ignore_errors=True)
    cfg = PipelineConfig(
        source_path=path, out_dir=out, run_id="r1", stop_on_error=True
    )
    with pytest.raises(Exception, match="StopOnError"):
        run_pipeline(spark, cfg)


def test_kept_output_is_partitioned_by_lang(run_result):
    dirs = glob.glob(os.path.join(lineage.kept_dir(OUT), "run=r1", "lang=*"))
    assert len(dirs) >= 4  # en + most of de/fr/es/it/pt
