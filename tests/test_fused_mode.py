"""Fused throughput mode must produce byte-identical results to the
checkpointed mode (only resume granularity differs)."""

from __future__ import annotations

import os
import shutil

import pandas as pd

from gobulk_spark import lineage
from gobulk_spark.config import PipelineConfig
from gobulk_spark.pipeline import run_pipeline


def test_fused_equals_checkpointed(spark, corpus_1500):
    path, _, _ = corpus_1500
    outs = {}
    for mode, fused in (("staged", False), ("fused", True)):
        out = f"/tmp/gobulk_spark_test_out/fusedcmp_{mode}"
        shutil.rmtree(out, ignore_errors=True)
        run_pipeline(
            spark,
            PipelineConfig(source_path=path, out_dir=out, run_id="r1", fused=fused),
        )
        audit = (
            lineage.read_audit(spark, out)
            .toPandas()
            .sort_values("image_id")
            .reset_index(drop=True)
        )
        kept = (
            lineage.read_kept(spark, out)
            .toPandas()
            .sort_values("image_id")
            .reset_index(drop=True)
        )
        outs[mode] = (audit, kept)
        if fused:
            assert not os.path.exists(
                os.path.join(out, "_stage", "r1", "features")
            ), "fused mode must not stage features"
    a, b = outs["staged"], outs["fused"]
    for col in ("image_id", "action", "rule_fired", "drop_reason", "issue_type"):
        assert (a[0][col].fillna("") == b[0][col].fillna("")).all(), col
    pd.testing.assert_frame_equal(
        a[1].drop(columns=["source_file"]), b[1].drop(columns=["source_file"])
    )
