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
