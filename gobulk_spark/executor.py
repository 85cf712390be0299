"""Operation classification + ordered execution (the Executor phase).

gobulk's Executor applies planned operations in a fixed order —
Deletes, then Updates, then Creates, then Omits (executor.go:96-113;
op types operation.go:45-54). Its e2e format emits Update when the row
already exists in the output store (runner_test.go:638-702). This
module re-expresses that contract over the kept parquet store:

- classify: a decided row whose image_id already exists in the kept
  store becomes an *update* (if it still passes the rules) or a
  *delete* (if the re-imported content now fails them); unseen ids are
  *create* / *omit* as before. Issues stay issues — a row that cannot
  be parsed is routed, never executed (issue.go:137-146).
- execute: Deletes first (prior kept rows of update∪delete ids are
  removed via staged directory rewrite), then Updates+Creates land
  together as this run's kept append. Omits and issues touch only the
  audit table.

Retry note: on a crashed store-phase retry after the delete step ran,
re-classification sees the prior rows already gone and yields
create/omit instead of update/delete. The kept-store END STATE is
identical (the execution is idempotent); only the audit action label
can downgrade on a torn retry. gobulk has the same property — its
executor re-runs operations against the mutated store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import lineage  # noqa: F401  (audit projection below)

#: action -> execution order (gobulk executor.go:96-113)
EXECUTION_ORDER = ("delete", "update", "create", "omit")


def dedup_exact_redeliveries(
    decided: DataFrame, probe: tuple[int, int] | None = None
) -> DataFrame:
    """Drop extra copies when the SAME (image_id, content_hash) appears
    more than once in one batch — invisible to scan-phase dedup (both
    rows ARE the min-id survivor) and it would land twice in the kept
    store. gobulk's tracker upsert absorbs these as Conflicted
    (tracker/gorm.go:121).

    Runs on the NARROW post-parse rows (upstream it would shuffle the
    binary column), and only when a cheap aggregate probe finds actual
    re-deliveries: the unconditional dropDuplicates shuffle would both
    collapse the salted partition spread on small batches (AQE
    coalesces it) and re-partition every downstream write for a
    condition that is almost always absent. Equal content_hash means
    identical content, so dropping either copy is lossless.

    ``probe``: pass a precomputed (n_rows, n_distinct_keys) pair to
    skip the aggregate job here — callers that need other scalars from
    the same frame (the update/delete-presence probe) fold all of them
    into ONE probe_decided() job instead of one job each."""
    if probe is not None:
        n_rows, n_keys = probe
    else:
        n_rows, n_keys = decided.select(
            F.count(F.lit(1)), F.count_distinct("image_id", "content_hash")
        ).first()
    if n_rows == n_keys:
        return decided
    return decided.dropDuplicates(["image_id", "content_hash"])


def probe_decided(decided: DataFrame) -> tuple[int, int, int, int, int, int]:
    """One aggregate job answering every pre-store scalar probe:
    (n_rows, n_distinct (id, hash) keys, n update/delete rows,
    n PURE delete rows, n distinct KEPT (id, hash) pairs, n distinct
    KEPT ids).

    The first action over the freshly-persisted decided frame pays the
    full parse compute to populate the cache; folding the re-delivery
    probe and the affected-rows probe into that same job keeps the
    fixed per-epoch job count down (the round-3 streaming profile:
    ~6 fixed jobs made a 7 s epoch floor at 5k rows). n_affected is
    probed PRE-dedup: dropping an exact duplicate copy never changes
    whether any update/delete row exists. The pure-delete count gates
    the Delete verb on merge-capable sinks, where updates are replaced
    inside the merge commit and only true removals still need D. The
    kept pair/id counts gate resolve_conflicting_ids: pairs > ids
    means one id carries two different kept contents in this batch."""
    kept = F.col("action").isin("update", "create")
    n_rows, n_keys, n_affected, n_pure, n_kept_pairs, n_kept_ids = decided.select(
        F.count(F.lit(1)),
        F.count_distinct("image_id", "content_hash"),
        F.sum(F.col("action").isin("update", "delete").cast("long")),
        F.sum((F.col("action") == "delete").cast("long")),
        F.count_distinct(F.when(kept, F.struct("image_id", "content_hash"))),
        F.count_distinct(F.when(kept, F.col("image_id"))),
    ).first()
    return (
        n_rows,
        n_keys,
        int(n_affected or 0),
        int(n_pure or 0),
        int(n_kept_pairs or 0),
        int(n_kept_ids or 0),
    )


def resolve_conflicting_ids(
    decided: DataFrame, probe: tuple[int, int] | None = None
) -> DataFrame:
    """Same image_id arriving with DIFFERENT kept content in ONE batch
    — two source files claiming one id, with no happened-before order
    to arbitrate. The row with the max content_hash survives
    (order-invariant, and the SAME tie-break _merge_marker_frames uses,
    so the marker's surviving pair is the store's surviving row); the
    losers become issue rows, visible in the audit and excluded from
    the kept store. gobulk's tracker absorbs these as Conflicted
    (tracker/gorm.go:121). Without this, a merge-capable sink refuses
    the duplicate-key upsert — correct for a one-shot batch, but a
    poison pill in streaming, where the checkpoint re-delivers the
    identical epoch forever.

    Gated like dedup_exact_redeliveries: the window shuffle is paid
    only when the probe (foldable into probe_decided's single job)
    finds an actual collision.

    ``probe``: precomputed (n_kept_pairs, n_kept_ids)."""
    from pyspark.sql import Window

    kept = F.col("action").isin("update", "create")
    if probe is not None:
        n_pairs, n_ids = probe
    else:
        n_pairs, n_ids = decided.select(
            F.count_distinct(
                F.when(kept, F.struct("image_id", "content_hash"))
            ),
            F.count_distinct(F.when(kept, F.col("image_id"))),
        ).first()
    if int(n_pairs or 0) == int(n_ids or 0):
        return decided
    # kept rows sort first within the id, so ranks 1..k are exactly the
    # competing kept siblings; rank 1 = the max-hash winner. Hashes are
    # distinct within an id here (exact duplicates were collapsed by
    # dedup_exact_redeliveries), so the order is total.
    w = Window.partitionBy("image_id").orderBy(
        kept.desc(), F.col("content_hash").desc()
    )
    out = decided.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_winner_hash", F.first("content_hash").over(w)
    )
    loser = kept & (F.col("_rn") > 1)
    note = F.concat(
        F.lit("conflicting content within one batch: superseded by "),
        F.lit("deterministic sibling "),
        F.col("_winner_hash"),
    )
    return (
        out.withColumn(
            "issue_note", F.when(loser, note).otherwise(F.col("issue_note"))
        )
        .withColumn(
            "keep", F.when(loser, F.lit(False)).otherwise(F.col("keep"))
        )
        .withColumn(
            "action", F.when(loser, F.lit("issue")).otherwise(F.col("action"))
        )
        .drop("_rn", "_winner_hash")
    )


def classify_actions(decided: DataFrame, existing_ids: DataFrame | None) -> DataFrame:
    """Refine the plan-phase action with an existence check.

    ``existing_ids`` is the distinct image_id frame of the current kept
    store (None on a first run — everything stays create/omit/issue).
    The join is left+broadcast when the store is small; at warehouse
    scale this is the shuffle join on the primary key that any upsert
    pays (Iceberg MERGE does the same under the hood).
    """
    if existing_ids is None:
        return decided
    marked = existing_ids.select("image_id").withColumn("_exists", F.lit(1))
    return (
        decided.join(marked, "image_id", "left")
        .withColumn(
            "action",
            F.when(F.col("action") == "issue", "issue")
            .when(F.col("keep") & F.col("_exists").isNotNull(), "update")
            .when(F.col("keep"), "create")
            .when(F.col("_exists").isNotNull(), "delete")
            .otherwise("omit"),
        )
        .drop("_exists")
    )


def execute_deletes(
    spark: SparkSession,
    sink,
    run_id: str,
    decided: DataFrame,
    actions: tuple[str, ...] = ("update", "delete"),
) -> None:
    """The D step: remove prior kept rows for every ``actions`` id
    through the sink's Delete verb (sinks.KeptSink). Merge-capable
    sinks narrow this to ("delete",): updated ids are replaced inside
    the merge commit itself."""
    affected = decided.where(F.col("action").isin(*actions)).select(
        "image_id"
    )
    sink.delete(spark, run_id, affected)


def kept_rows(decided: DataFrame, columns: tuple[str, ...]) -> DataFrame:
    """The U+C step's payload: rows that land in this run's kept dir."""
    return (
        decided.where(F.col("action").isin("update", "create"))
        .withColumn("caption", F.col("scrubbed_caption"))
        .select(*columns)
    )


def failures_frame(spark: SparkSession, failures) -> DataFrame | None:
    """Normalize ``sink.write``'s result to a failures DataFrame (or
    None when nothing failed).

    Every downstream consumer — failure audit, marker exclusion, retry
    staging, manifest withholding — routes through DataFrame joins on
    this frame, never through a driver-side id list: a wholesale epoch
    failure (every row permanent) must not become an ``isin()``
    expression-tree bomb or a driver materialization of row data."""
    from .sinks import FAILURE_SCHEMA_DDL

    if failures is None:
        return None
    if isinstance(failures, DataFrame):
        return failures
    if not failures:
        return None
    rows = [
        (
            f["image_id"],
            f.get("source_file"),
            f.get("content_hash"),
            f.get("payload"),
            f.get("error_msg"),
            f.get("attempts"),
        )
        for f in failures
    ]
    return spark.createDataFrame(rows, FAILURE_SCHEMA_DDL)


def write_failure_audit(failed: DataFrame, run_id: str) -> DataFrame:
    """Audit issue rows for items a transactional sink could not land
    after its retry budget (gobulk's per-item bulk-response issues,
    output/elasticsearch.go:309-320). A pure column projection over the
    failures frame — scales to wholesale failure without touching the
    driver."""
    msg = F.concat(
        # coalesce BOTH parts: concat null-propagates, and a sink that
        # omits error_msg must not null the whole audit message
        F.coalesce(F.col("error_msg"), F.lit("None")),
        F.lit(" (attempts="),
        F.coalesce(F.col("attempts").cast("string"), F.lit("None")),
        F.lit(")"),
    )
    return lineage.audit_columns(
        failed,
        run_id,
        F.lit("execute"),
        F.lit("issue"),
        F.lit("sink_write_failed"),
        F.lit("write_failed"),
        F.lit("output_write"),
        content_hash_col=F.col("content_hash"),
        payload_col=F.col("payload"),
        error_col=msg,
    )


def store_audit_columns(decided: DataFrame, run_id: str) -> DataFrame:
    """Audit projection for the store phase, including issue payloads."""
    is_issue = F.col("action") == "issue"
    return lineage.audit_columns(
        decided,
        run_id,
        # deletes MUTATE the kept store, so they audit as phase=execute
        # like create/update (gobulk's executor runs them,
        # executor.go:96-113); only omit — decided, nothing executed —
        # stays phase=plan
        F.when(is_issue, "parse")
        .when(F.col("action") == "omit", "plan")
        .otherwise("execute"),
        F.col("action"),
        F.col("drop_reason"),
        F.col("drop_reason"),
        F.when(is_issue, "data_parsing").otherwise(F.lit(None).cast("string")),
        content_hash_col=F.col("content_hash"),
        payload_col=F.when(is_issue, F.col("scrubbed_caption")),
        error_col=F.when(is_issue, F.col("issue_note")),
    )
