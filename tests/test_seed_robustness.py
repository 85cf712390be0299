"""The F1 contract must hold for corpora the thresholds were never tuned
against — a different seed produces different captions, images, defect
mix and duplicates."""

from __future__ import annotations

import os
import shutil

import pyarrow.parquet as pq
import pytest

from gobulk_spark import lineage, reference_labeler as rl
from gobulk_spark.config import PipelineConfig
from gobulk_spark.corpus import generate_pairs
from gobulk_spark.pipeline import run_pipeline


@pytest.mark.slow
def test_pipeline_matches_labeler_on_unseen_seed(spark):
    src_dir = "/tmp/gobulk_spark_test_corpora/seed123"
    out = "/tmp/gobulk_spark_test_out/seed123"
    shutil.rmtree(src_dir, ignore_errors=True)
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(src_dir)
    pairs_t, _ = generate_pairs(800, seed=123)
    path = os.path.join(src_dir, "pairs.parquet")
    pq.write_table(pairs_t, path)

    run_pipeline(spark, PipelineConfig(source_path=path, out_dir=out, run_id="r1"))
    audit = lineage.read_audit(spark, out).toPandas()
    golden = rl.label(pairs_t.to_pandas())
    m = audit.merge(golden, on="image_id")
    spark_keep = m["action"] == "create"
    tp = (spark_keep & m.keep).sum()
    fp = (spark_keep & ~m.keep).sum()
    fn = (~spark_keep & m.keep).sum()
    f1 = 2 * tp / (2 * tp + fp + fn)
    assert f1 >= 0.99, (fp, fn)
    kept = lineage.read_kept(spark, out).toPandas()
    km = kept.merge(golden[["image_id", "scrubbed_caption"]], on="image_id")
    assert (km["caption"] == km["scrubbed_caption"]).all()
