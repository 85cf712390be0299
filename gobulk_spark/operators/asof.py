"""As-of join — a temporal operator Spark's DataFrame API lacks.

For each left row, attach the most recent right row with
right.ts <= left.ts within the same key group (the classic
point-in-time / last-tick join of event pipelines: enrich a purchase
with the last preceding page view, a trade with the last quote).

Spark-first implementation: NO join at all. Both sides are tagged and
unioned, then one window pass per key group ordered by
(ts, side-marker) carries the latest right-side attributes forward
with last(..., ignorenulls=True); left rows then read the carried
values. Cost = one shuffle on the key column + one sort within
partitions — the same price as a groupBy, independent of how many
right rows precede each left row (an equi-join + max-filter would be
quadratic per key). Equal timestamps match (right sorts before left
at the same ts via the marker).

Oracle: DuckDB's native ASOF JOIN — the driver checks this operator
bit-for-bit (query ``asof_join_purchase_view``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _tagged_union(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts_col: str,
    right_cols: tuple[str, ...],
    tie_break: str | None,
):
    """Tag both sides, union them, and build the carry-forward sort
    order. Returns (union, left_columns, order_exprs)."""
    lcols = left.columns
    ltypes = {f.name: f.dataType for f in left.schema.fields}
    # ONE struct column carries the whole right row: carrying each
    # attribute independently with last(ignorenulls) would stitch
    # fields from DIFFERENT right rows whenever the latest row has a
    # null attribute — the snapshot must be atomic
    r_struct = F.struct(*[F.col(c) for c in right_cols])
    struct_t = right.select(r_struct.alias("_r")).schema["_r"].dataType
    l_tag = left.select(
        *lcols,
        F.lit(1).alias("_side"),
        F.lit(None).cast(struct_t).alias("_r"),
    )
    r_tag = right.select(
        F.col(by),
        F.col(ts_col),
        *[
            F.lit(None).cast(ltypes[c]).alias(c)
            for c in lcols
            if c not in (by, ts_col)
        ],
        F.lit(0).alias("_side"),
        r_struct.alias("_r"),
    ).select(*lcols, "_side", "_r")
    u = l_tag.unionByName(r_tag)
    # right (_side=0) sorts before left (_side=1) at equal ts -> ties match
    order = [F.col(ts_col), F.col("_side")]
    if tie_break is not None:
        # nulls FIRST so a null tie-break row loses: last() then picks
        # the highest non-null value, as documented
        order.append(F.col("_r").getField(tie_break).asc_nulls_first())
    return u, lcols, order


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts_col: str,
    right_cols: tuple[str, ...],
    prefix: str = "asof_",
    tie_break: str | None = None,
) -> DataFrame:
    """Left as-of-backward join: all left columns + ``prefix``-named
    snapshots of ``right_cols`` from the latest right row at-or-before
    each left row's ``ts_col`` (null when no right row precedes).

    ``by`` is the equality key (shuffle key); both frames must carry
    ``by`` and ``ts_col``. Right rows that tie a left row's timestamp
    DO match, mirroring DuckDB ASOF's >= semantics. When several RIGHT
    rows share (by, ts), pass ``tie_break`` (a right_cols member) to
    make the winner deterministic (highest value wins); otherwise
    pre-dedupe the right side.
    """
    u, lcols, order = _tagged_union(left, right, by, ts_col, right_cols, tie_break)
    w = (
        Window.partitionBy(by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        *lcols,
        F.col("_side"),
        F.last("_r", ignorenulls=True).over(w).alias("_snap"),
    )
    return carried.where(F.col("_side") == 1).select(
        *lcols,
        *[F.col("_snap").getField(c).alias(f"{prefix}{c}") for c in right_cols],
    )


def asof_join_salted(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts_col: str,
    right_cols: tuple[str, ...],
    prefix: str = "asof_",
    tie_break: str | None = None,
    n_buckets: int = 16,
    rel_err: float = 1e-3,
) -> DataFrame:
    """Skew-safe as-of join: identical results to :func:`asof_join`,
    with every key's timeline SPLIT across ``n_buckets`` time-range
    partitions instead of landing whole in one window partition.

    Why: the plain operator shuffles on ``by`` alone, so one hot key
    (one user producing half the events) is one straggler task at
    scale — the same failure mode salted_join defeats for equi-joins.
    Salting a carry-forward window needs care that hash salting does
    not: rows early in a fragment depend on the LAST right row of every
    earlier fragment. The classic salt-then-merge-boundaries shape:

    1. cut the (global) time axis into ``n_buckets`` ranges at
       approx-quantile boundaries (one cheap sketch job; bucket
       assignment is a deterministic CASE over ts, so retries agree);
    2. ONE window pass per (key, bucket) — the skewed key now spreads
       over up to ``n_buckets`` tasks — computing the within-bucket
       carry; the bucket-final right snapshot comes from a SEPARATE
       max_by aggregate over the right rows only (the window subtree
       is the data-sized cost and Catalyst does not reuse its exchange
       across a fan-out — measured);
    3. per-key bucket summaries (≤ n_keys × n_buckets rows, tiny),
       left-joined onto the full (key, bucket) domain so carry-in
       flows through left-only buckets, carry the boundary snapshot
       forward with a second window over the SUMMARIES — skew-free by
       construction;
    4. join the carry-in back on (key, bucket) and coalesce the whole
       snapshot STRUCT (atomicity: never stitch fields from two rows).

    Equal timestamps keep the >= tie semantics: bucket assignment is a
    function of ts alone, so tied rows share a bucket and the _side
    ordering decides inside the window, exactly as in the plain
    operator. Caveat (same precondition as the plain operator): with
    DUPLICATE right rows on (by, ts) and no ``tie_break``, which copy
    wins is arbitrary on both operators and may differ BETWEEN them
    (the bucket-final aggregate resolves the tie independently of the
    window sort) — pass ``tie_break`` or pre-dedupe the right side for
    a deterministic, provably-equal result.

    The provable-equality oracle: the driver runs this operator
    against the same DuckDB ASOF JOIN oracle as the plain one
    (query ``asof_join_salted_view``), and the skew test pins plan
    spread + result equality at one-key-owns-half-the-rows skew.
    """
    if n_buckets <= 1:
        return asof_join(left, right, by, ts_col, right_cols, prefix, tie_break)
    u, lcols, order = _tagged_union(left, right, by, ts_col, right_cols, tie_break)
    # NOT pinned, deliberately (round-6 A/B): although four consumers
    # follow (quantile sketch, within-bucket window, bucket-final
    # aggregate, domain distinct), the three main-plan consumers hash
    # on the same (by[, bucket]) keys and AQE reuses their exchanges,
    # so caching the tagged union (wide struct rows) measured SLOWER
    # (5.3 s -> 6.2 s at sf1.0) than the recompute it saves.
    from pyspark.sql.types import TimestampNTZType, TimestampType

    if isinstance(u.schema[ts_col].dataType, (TimestampType, TimestampNTZType)):
        # TIMESTAMP_NTZ has no direct double cast in Spark 4.x — route
        # through timestamp (epoch seconds); bucket assignment only
        # needs a monotone map of ts, so the unit is irrelevant
        ts_d = F.col(ts_col).cast("timestamp").cast("double")
    else:
        ts_d = F.col(ts_col).cast("double")
    # the sketch runs over the LEFT side only (round 6): the result is
    # provably identical for ANY cut placement — bucket assignment is a
    # monotone function of ts alone, tied rows always share a bucket,
    # and the carry chain stitches across every boundary (the
    # plain==salted equality tests pin this for the documented tie
    # rules) — so the boundaries are a load-balancing choice, not a
    # correctness input. Sketching the full tagged union re-evaluated
    # both input subtrees including the right side's pre-dedup groupBy;
    # the left projection is one narrow column-pruned pass.
    cuts = sorted(
        set(
            left.select(ts_d.alias("_t")).approxQuantile(
                "_t", [i / n_buckets for i in range(1, n_buckets)], rel_err
            )
        )
    )
    bucket = F.lit(0)
    for c in cuts:
        bucket = bucket + (ts_d > F.lit(c)).cast("int")
    u = u.withColumn("_bkt", bucket)
    w_in = (
        Window.partitionBy(by, "_bkt")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        *lcols,
        F.col("_side"),
        F.col("_bkt"),
        F.last("_r", ignorenulls=True).over(w_in).alias("_snap"),
    )
    # bucket-final right snapshot per (key, bucket) — an AGGREGATE over
    # the RIGHT rows only, NOT a second window over carried: the window
    # subtree is the data-sized cost, and Spark does not reuse the
    # exchange across the summaries/join fan-out (verified: 0
    # ReusedExchange under AQE), so hanging summaries off `carried`
    # computed the full window twice. max_by(struct(ts[, tie])) matches
    # the window order exactly: struct comparison puts a null tie field
    # first (it loses), the same asc_nulls_first rule the window uses.
    # Map-side partial agg reduces each partition to <=1 row per
    # (key, bucket) before the (tiny) shuffle.
    tie_key = (
        F.struct(F.col(ts_col), F.col("_r").getField(tie_break))
        if tie_break is not None
        else F.struct(F.col(ts_col))
    )
    right_final = (
        u.where(F.col("_side") == 0)
        .groupBy(by, "_bkt")
        .agg(F.max_by("_r", tie_key).alias("_bfinal"))
    )
    # every (key, bucket) the data occupies must appear in the carry
    # chain — a bucket holding only LEFT rows still needs the carry-in
    # from earlier buckets to flow THROUGH it (null _bfinal, skipped by
    # last(ignorenulls)); both sides are cheap narrow aggregates
    summaries = (
        u.select(by, "_bkt").distinct().join(right_final, [by, "_bkt"], "left")
    )
    w_carry = (
        Window.partitionBy(by)
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry_in = summaries.select(
        by,
        "_bkt",
        F.last("_bfinal", ignorenulls=True).over(w_carry).alias("_carry"),
    )
    joined = carried.join(carry_in, [by, "_bkt"], "left")
    snap = F.coalesce(F.col("_snap"), F.col("_carry"))
    return joined.where(F.col("_side") == 1).select(
        *lcols,
        *[snap.getField(c).alias(f"{prefix}{c}") for c in right_cols],
    )


# the skew probe lives with the equi-join skew machinery; re-exported
# here because asof_join_auto is its second consumer
from .relational import max_key_share  # noqa: E402


def asof_join_auto(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts_col: str,
    right_cols: tuple[str, ...],
    prefix: str = "asof_",
    tie_break: str | None = None,
    n_buckets: int = 16,
    skew_threshold: float = 0.125,
) -> DataFrame:
    """One as-of entry point that picks plain-vs-salted from MEASURED
    key skew (round-4 VERDICT #5): the salted rewrite costs ~2× the
    plain operator at sf0.1 (priced in BASELINE.md), so paying it
    should be a data-driven decision, not a caller guess.

    A key owning more than ``skew_threshold`` of the unioned rows is a
    straggler at scale (one window partition doing ≥ threshold of the
    job on one task); :func:`max_key_share` proves or refutes that with
    narrow column-pruned probe jobs, and non-skewed inputs then pay
    exactly the plain operator's plan. The default threshold is 4×
    the ideal per-task share at 32-way parallelism — hot enough that
    the 2× salting premium beats the straggler tail it removes."""
    share = max_key_share(
        left.select(by).unionAll(right.select(by)), by, skew_threshold
    )
    if share > skew_threshold:
        return asof_join_salted(
            left, right, by, ts_col, right_cols, prefix, tie_break, n_buckets
        )
    return asof_join(left, right, by, ts_col, right_cols, prefix, tie_break)
