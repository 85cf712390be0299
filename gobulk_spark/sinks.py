"""Pluggable kept-store sinks — gobulk's Output interface seam.

gobulk defines Output with Elements (existence lookup) and
Create/Update/Delete execution (output.go:12-16) and ships ES and
GORM/MySQL backends (output/elasticsearch.go:231-320,
output/gorm.go:114-152). The engine here is sink-agnostic through the
same four verbs:

- recover       — heal half-finished writes before any read
- existing_ids  — Output.Elements: which incoming ids already exist
- write         — Create/Update: land a run's kept rows
- delete        — Delete: remove keys from prior runs' data

ParquetKeptSink is the default (run=<id>/lang=<l> directory layout,
atomic swap deletes via lineage/fsutil). MemoryKeptSink is the
reference second backend proving the seam: the full e2e suite passes
against it (tests/test_sinks.py). An Iceberg/ES sink implements the
same protocol; nothing in pipeline.py changes.
"""

from __future__ import annotations

from typing import Protocol

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import lineage


class KeptSink(Protocol):
    def recover(self, spark: SparkSession) -> None: ...

    def existing_ids(
        self, spark: SparkSession, exclude_run_id: str
    ) -> DataFrame | None: ...

    def write(self, df: DataFrame, run_id: str) -> None: ...

    def delete(self, spark: SparkSession, run_id: str, keys: DataFrame) -> None: ...

    def read(self, spark: SparkSession) -> DataFrame | None: ...


class ParquetKeptSink:
    """Default sink: per-run parquet dirs partitioned by lang, deletes
    as staged rewrite + atomic swap (Iceberg-MERGE shaped)."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir

    def recover(self, spark: SparkSession) -> None:
        lineage.recover_kept_swaps(spark, self.out_dir)

    def existing_ids(self, spark: SparkSession, exclude_run_id: str) -> DataFrame | None:
        return lineage.prior_kept_ids(spark, self.out_dir, exclude_run_id)

    def write(self, df: DataFrame, run_id: str) -> None:
        df.write.mode("overwrite").partitionBy("lang").parquet(
            f"{lineage.kept_dir(self.out_dir)}/run={run_id}"
        )

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

    def write(self, df: DataFrame, run_id: str) -> None:
        self.runs[run_id] = df.toPandas()

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
