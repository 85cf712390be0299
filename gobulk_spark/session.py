"""SparkSession construction with the engine's defaults.

gobulk analogue: NewRunner wiring + Storage.Prepare/Setup lifecycle
(runner.go:46-86, storage.go:12-23) — collapsed to session + conf.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    master: str | None = None,
    app_name: str = "gobulk-spark",
    shuffle_partitions: int | None = None,
    arrow_batch_rows: int = 2048,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_MASTER", f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    cores = master.split("[")[-1].rstrip("]") if "[" in master else "32"
    nshuffle = shuffle_partitions or (int(cores) * 2 if cores.isdigit() else 64)
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # AQE: runtime coalescing + skew-split for the non-UDF shuffles
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # let the planner pick shuffled-hash over sort-merge when its
        # size conditions hold, and let AQE rewrite SMJ->SHJ when every
        # post-shuffle partition fits the local map threshold: the
        # dedup-family self-joins (shingles, fingerprints, segments)
        # never benefit from sorted output, and the sort is pure cost.
        # Build-side OOM risk is bounded by AQE partition sizing; at
        # warehouse scale the same conditions simply stop holding and
        # the planner falls back to sort-merge (guide defaults, round 6:
        # measured -0.2..-0.8 s on each of 7 join-heavy legs at sf1.0).
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            str(64 * 1024 * 1024),
        )
        .config("spark.sql.shuffle.partitions", str(nshuffle))
        # Arrow everywhere; batch size bounds executor-python memory since
        # batches carry image bytes into the parse stage
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch_rows))
        # oracle comparisons: duckdb timestamps are UTC-naive
        .config("spark.sql.session.timeZone", "UTC")
        # partition values are IDENTIFIERS here (run=007, lang=en):
        # inference would type run=007 as int 7, breaking the string
        # round-trip the delete-leaf swap and run-exclusion compare
        # depend on (read_kept's cast would yield '7' != '007')
        .config("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()


def ensure_active(spark: SparkSession) -> None:
    """Pin ``spark`` as the active session for the CURRENT thread.

    getActiveSession() consults a JVM thread-local; a pipeline driven
    from a scheduler/worker thread (our pause-while-intermitted test,
    any orchestrator running imports off the main thread) sees None
    there and every spark=None helper default breaks. No public PySpark
    API sets it, so reach for the JVM classmethod; harmless no-op if
    the private surface is unavailable (e.g. Spark Connect)."""
    try:
        spark._jvm.org.apache.spark.sql.SparkSession.setActiveSession(  # type: ignore[union-attr]
            spark._jsparkSession
        )
    except Exception:
        pass
