"""The Output seam: the e2e pipeline runs unchanged against a second
sink backend (gobulk output.go:12-16 — ES and GORM both implement the
same four verbs; here parquet and in-memory do)."""

from __future__ import annotations

import os
import shutil

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from gobulk_spark import lineage
from gobulk_spark.config import PipelineConfig
from gobulk_spark.corpus import SEED_TEXT, generate_pairs
from gobulk_spark.pipeline import run_pipeline
from gobulk_spark.sinks import MemoryKeptSink, ParquetKeptSink

BASE = "/tmp/gobulk_spark_test_out/sinks"


def _write(pdf: pd.DataFrame, path: str) -> str:
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), path)
    return path


def test_memory_sink_full_update_delete_cycle(spark):
    shutil.rmtree(BASE, ignore_errors=True)
    os.makedirs(BASE, exist_ok=True)
    pairs, _ = generate_pairs(400, seed=5)
    pdf = pairs.to_pandas()
    src = _write(pdf, os.path.join(BASE, "src.parquet"))
    out = os.path.join(BASE, "out")
    sink = MemoryKeptSink()
    run_pipeline(
        spark, PipelineConfig(source_path=src, out_dir=out, run_id="r1"), sink=sink
    )
    kept1 = sink.read(spark).toPandas()
    assert len(kept1) > 0 and kept1["image_id"].is_unique
    # the parquet kept dir was NOT written — output went to the sink
    assert not os.path.isdir(os.path.join(out, "kept"))
    # audit/metrics/checkpoints still flow through lineage (Tracker)
    assert lineage.read_audit(spark, out) is not None

    upd_id, del_id = sorted(kept1.image_id)[0], sorted(kept1.image_id)[1]
    good = SEED_TEXT["en"][0] + " " + SEED_TEXT["en"][1]
    pdf2 = pdf.copy()
    pdf2.loc[pdf2.image_id == upd_id, "caption"] = good
    pdf2.loc[pdf2.image_id == del_id, "caption"] = "x"
    src2 = _write(pdf2, os.path.join(BASE, "src2.parquet"))
    run_pipeline(
        spark,
        PipelineConfig(source_path=src2, out_dir=out, run_id="r2", incremental=True),
        sink=sink,
    )
    kept2 = sink.read(spark).toPandas()
    assert kept2["image_id"].is_unique
    rows = kept2[kept2.image_id == upd_id]
    assert len(rows) == 1 and rows.iloc[0]["caption"] == good
    assert rows.iloc[0]["run"] == "r2"
    assert del_id not in set(kept2.image_id)
    # everything else untouched
    assert len(kept2) == len(kept1) - 1


def test_parquet_and_memory_sinks_agree(spark):
    """Same corpus, both backends: identical kept row sets."""
    base = os.path.join(BASE, "agree")
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base, exist_ok=True)
    pairs, _ = generate_pairs(300, seed=6)
    src = _write(pairs.to_pandas(), os.path.join(base, "src.parquet"))
    mem = MemoryKeptSink()
    run_pipeline(
        spark,
        PipelineConfig(source_path=src, out_dir=os.path.join(base, "m"), run_id="r1"),
        sink=mem,
    )
    run_pipeline(
        spark,
        PipelineConfig(source_path=src, out_dir=os.path.join(base, "p"), run_id="r1"),
    )
    a = mem.read(spark).toPandas()
    b = ParquetKeptSink(os.path.join(base, "p")).read(spark).toPandas()
    ka = a.sort_values("image_id")[["image_id", "caption", "lang"]].reset_index(drop=True)
    kb = b.sort_values("image_id")[["image_id", "caption", "lang"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(ka, kb)


def test_memory_sink_survives_all_dropped_prior_run(spark):
    """A prior run that kept ZERO rows must not crash existing_ids /
    read (createDataFrame cannot infer a schema from an empty frame)."""
    import pandas as _pd

    from gobulk_spark.sinks import MemoryKeptSink

    sink = MemoryKeptSink()
    sink.runs["r0"] = _pd.DataFrame(columns=["image_id", "caption", "lang"])
    assert sink.existing_ids(spark, exclude_run_id="r1") is None
    assert sink.read(spark) is None
