"""Traceability tables: audit, metrics, checkpoint manifest.

gobulk's Tracker contract re-expressed over parquet directories (the
Iceberg jars are not in this image; the table-access layer lives here so
swapping parquet-dirs for Iceberg `writeTo().append()` + snapshots is a
local change, per SURVEY §7):

- audit table   ≙ Issue rows + Operation rows (issue.go:52-64,
  operation.go:9-20): one row per input row per run, with phase, action,
  rule_fired, drop_reason, issue_type, partition_id.
- metrics table ≙ MetricsTracker counters (metrics_tracker.go:4-14).
- checkpoint    ≙ Iteration / started-finished markers (iteration.go:10-31,
  tracker/gorm.go:211-244): a JSON manifest per (run_id, phase), written
  tmp-then-rename so the commit flip is atomic — phase outputs staged
  first, checkpoint flipped last (idempotent resume under partial
  failure).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

AUDIT_SCHEMA = (
    "run_id string, image_id string, source_file string, phase string, "
    "action string, rule_fired string, drop_reason string, issue_type string, "
    "partition_id int, created timestamp"
)

PHASES = ("scan", "parse", "store")


def audit_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "audit")


def metrics_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "metrics")


def kept_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "kept")


def read_kept(spark: SparkSession, out_dir: str) -> DataFrame:
    """All kept rows across runs (run/lang recovered as partition cols)."""
    return spark.read.parquet(kept_dir(out_dir))


def stage_dir(out_dir: str, run_id: str, name: str) -> str:
    return os.path.join(out_dir, "_stage", run_id, name)


def _ckpt_path(out_dir: str, run_id: str, phase: str) -> str:
    return os.path.join(out_dir, "_checkpoint", run_id, f"{phase}.json")


def phase_committed(out_dir: str, run_id: str, phase: str) -> dict | None:
    """Manifest dict if the phase committed in a prior attempt, else None."""
    p = _ckpt_path(out_dir, run_id, phase)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def commit_phase(out_dir: str, run_id: str, phase: str, **info) -> dict:
    """Atomically record a phase commit (stage outputs must exist already)."""
    p = _ckpt_path(out_dir, run_id, phase)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    manifest = {
        "run_id": run_id,
        "phase": phase,
        "status": "committed",
        "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        **info,
    }
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, p)  # the atomic snapshot flip
    return manifest


def write_audit(df: DataFrame, out_dir: str, phase: str, run_id: str) -> None:
    """Write audit rows for one (phase, run).

    Overwrite scoped to the phase+run directory keeps re-runs idempotent:
    a crashed store phase that re-runs replaces exactly its own audit
    rows, never duplicating or touching other runs (gobulk's
    started/finished dance, solved by directory-scoped atomic replace).
    """
    df.write.mode("overwrite").parquet(
        os.path.join(audit_dir(out_dir), f"wphase={phase}", f"run={run_id}")
    )


def read_audit(spark: SparkSession, out_dir: str) -> DataFrame | None:
    path = audit_dir(out_dir)
    if not os.path.isdir(path) or not any(
        e.startswith("wphase=") for e in os.listdir(path)
    ):
        return None
    return spark.read.parquet(path)  # wphase=/run= dirs discovered as partitions


def audit_columns(
    df: DataFrame, run_id: str, phase_col, action_col, rule_col, reason_col, issue_col
) -> DataFrame:
    """Project any per-row frame to the audit schema."""
    return df.select(
        F.lit(run_id).alias("run_id"),
        F.col("image_id"),
        F.col("source_file"),
        phase_col.alias("phase"),
        action_col.alias("action"),
        rule_col.alias("rule_fired"),
        reason_col.alias("drop_reason"),
        issue_col.alias("issue_type"),
        F.spark_partition_id().alias("partition_id"),
        F.current_timestamp().alias("created"),
    )


def write_metrics(df: DataFrame, out_dir: str, phase: str, run_id: str) -> None:
    df.write.mode("overwrite").parquet(
        os.path.join(metrics_dir(out_dir), f"wphase={phase}", f"run={run_id}")
    )


def partition_metrics(decided: DataFrame, run_id: str) -> DataFrame:
    """Per-partition counters (gobulk phase timers/gauges analogue)."""
    return (
        decided.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(
            F.count("*").alias("rows_in"),
            F.sum(F.col("keep").cast("long")).alias("rows_kept"),
            F.sum((F.col("action") == "omit").cast("long")).alias("rows_dropped"),
            F.sum((F.col("action") == "issue").cast("long")).alias("rows_issued"),
        )
        .withColumn("run_id", F.lit(run_id))
    )


def processed_image_ids(
    spark: SparkSession,
    out_dir: str,
    exclude_run_id: str | None = None,
    exclude_phases: tuple[str, ...] | None = None,
) -> DataFrame | None:
    """Marker for incremental runs: every image_id any prior run audited.

    gobulk analogue: Iteration.LastTrackedContainer / resume marker
    (listener.go:107, runner.go:60-63). At warehouse scale this becomes
    an Iceberg incremental snapshot read instead of an anti-join.

    ``exclude_run_id`` drops the named run's own audit rows from the
    marker (partition-pruned on the run=/wphase= directory keys). A
    retried phase must see the same input as its first attempt, never be
    masked by its own half-committed audit (idempotency under partial
    failure). ``exclude_phases`` limits the exclusion to those phases of
    the excluded run: the parse phase excludes only ("store",) so the
    committed scan audit still subsumes the duplicate anti-join.
    """
    audit = read_audit(spark, out_dir)
    if audit is None:
        return None
    if exclude_run_id is not None:
        own = F.col("run") == exclude_run_id
        if exclude_phases is not None:
            own = own & F.col("wphase").isin(*exclude_phases)
        audit = audit.where(~own)
    return audit.select("image_id").distinct()
