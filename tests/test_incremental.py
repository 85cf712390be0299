"""Incremental (marker) semantics — gobulk's TestSimpleRunWithMarker port.

Run 1 processes a 1000-row corpus; the source then grows to 1300 rows
(prefix-stable generator); run 2 with incremental=True must process only
the 300 new rows and leave run 1's outputs untouched.
"""

from __future__ import annotations

import os
import shutil

import pytest

from gobulk_spark import lineage
from gobulk_spark.config import PipelineConfig
from gobulk_spark.corpus import generate_pairs
from gobulk_spark.pipeline import run_pipeline

OUT = "/tmp/gobulk_spark_test_out/incremental"
SRC = "/tmp/gobulk_spark_test_corpora/incremental"


def _write(n: int) -> str:
    import pyarrow.parquet as pq

    os.makedirs(SRC, exist_ok=True)
    pairs, _ = generate_pairs(n, seed=42)
    path = os.path.join(SRC, "pairs.parquet")
    pq.write_table(pairs, path)
    return path


def test_generator_prefix_stable():
    a, _ = generate_pairs(100, seed=42)
    b, _ = generate_pairs(150, seed=42)
    assert a.equals(b.slice(0, 100))


def test_incremental_processes_only_new_rows(spark):
    shutil.rmtree(OUT, ignore_errors=True)
    shutil.rmtree(SRC, ignore_errors=True)
    path = _write(1000)
    s1 = run_pipeline(
        spark, PipelineConfig(source_path=path, out_dir=OUT, run_id="r1")
    )
    audit1 = lineage.read_audit(spark, OUT).toPandas()
    assert len(audit1) == 1000

    path = _write(1300)  # same first 1000 rows + 300 new
    s2 = run_pipeline(
        spark,
        PipelineConfig(
            source_path=path, out_dir=OUT, run_id="r2", incremental=True
        ),
    )
    audit2 = lineage.read_audit(spark, OUT).toPandas()
    assert len(audit2) == 1300
    r2 = audit2[audit2.run_id == "r2"]
    assert len(r2) == 300
    assert set(r2.image_id) == {f"img-{i:08x}" for i in range(1000, 1300)}
    # run 1 rows untouched
    r1 = audit2[audit2.run_id == "r1"].sort_values("image_id").reset_index(drop=True)
    a1 = audit1.sort_values("image_id").reset_index(drop=True)
    assert (r1["image_id"] == a1["image_id"]).all()
    assert (r1["action"] == a1["action"]).all()
    # kept table accumulates across runs
    kept = lineage.read_kept(spark, OUT).toPandas()
    assert set(kept["run"].unique()) == {"r1", "r2"}
    assert kept["image_id"].is_unique
