"""Relational scale patterns: skew-defeating salted join.

AQE's skew-join split handles moderate skew automatically, but a
pathologically hot key (one user with 10^9 events joined to a
non-broadcastable right side) still lands entire key groups on single
reducers when the right side must shuffle. The classic fix: salt the
big side's key with a deterministic shard id and replicate the small
side once per salt — the hot key fans out over ``n_salts`` reducers
and the join result is IDENTICAL to the plain join (oracle-checked,
query salted_join_revenue).

Cost model: right side is duplicated n_salts times (choose n_salts ~
the skew factor, not the cluster size); the left side pays one extra
narrow column. Use only when the right side is too big to broadcast
and a key is hot enough to dominate the stage; otherwise plain join +
AQE wins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
    salt_by: str | None = None,
) -> DataFrame:
    """Join ``left`` (big, skewed) to ``right`` (small-ish, not
    broadcastable) on ``on``, spreading each key over ``n_salts``
    reducers. Deterministic: the salt derives from xxhash64 of
    ``salt_by`` (default: every left column), so retried tasks
    repartition identically — never rand().
    """
    # the identity `salted == plain` holds only when unmatched RIGHT
    # rows never surface: the right side is replicated once per salt, so
    # right/full-outer would emit n_salts null-extended duplicates per
    # unmatched right key. Normalize Spark's join-type aliases
    # (leftouter/left_outer/semi/leftsemi/... are all accepted by
    # DataFrame.join) and reject by the UNSAFE set, not a spelling
    # whitelist
    norm = how.lower().replace("_", "")
    unsafe = ("right", "rightouter", "full", "fullouter", "outer", "cross")
    if norm in unsafe:
        raise ValueError(
            f"salted_join does not support how={how!r}: the right side is "
            "replicated once per salt, so right/full joins would emit "
            "n_salts null-extended duplicates per unmatched right key"
        )
    salt_src = F.xxhash64(*(left.columns if salt_by is None else [salt_by]))
    l = left.withColumn("_salt", F.pmod(salt_src, F.lit(n_salts)).cast("int"))
    r = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    return l.join(r, [on, "_salt"], how).drop("_salt")


def max_key_share(df: DataFrame, by: str, support: float = 0.125) -> float:
    """Largest single-key share of ``df``'s rows, measured with two
    cheap narrow jobs over the PRUNED key column:

    1. ``freqItems`` (Misra-Gries single pass, map-side summaries
       merged on the driver, no shuffle of row data) finds every
       non-null key whose share COULD exceed ``support``;
    2. the (≤ 1/support) candidates get exact counts in ONE global
       aggregate (conditional sums + the null share, map-side partial
       agg — again no wide shuffle), because Misra-Gries over-reports:
       acting on its false positives would make uniform inputs pay
       the salted price.

    NULL is measured as a key of its own: a null-heavy column is a
    classic straggler for window operators (every null row lands in ONE
    window partition), so the probe must see it even though freqItems
    candidates can't represent it — the exact-count aggregate always
    carries a null-share column alongside the candidate counts.

    At warehouse scale both jobs read one column and reduce to a
    handful of driver longs — the probe is O(scan) with no wide
    exchange, vs the straggler it prevents. Shared by the two
    skew-adaptive entry points (salted_join_auto, asof.asof_join_auto).
    """
    keys = df.select(by)
    cands = [c for c in keys.stat.freqItems([by], support).first()[0] if c is not None]
    row = keys.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col(by).isNull().cast("long")).alias("_null"),
        *[
            F.sum((F.col(by) == F.lit(c)).cast("long")).alias(f"_c{i}")
            for i, c in enumerate(cands)
        ],
    ).first()
    n = row["_n"] or 0
    if not n:
        return 0.0
    shares = [int(row["_null"] or 0)] + [
        int(row[f"_c{i}"] or 0) for i in range(len(cands))
    ]
    return max(shares) / n


def salted_join_auto(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
    salt_by: str | None = None,
    skew_threshold: float = 0.125,
) -> DataFrame:
    """One equi-join entry point that picks plain-vs-salted from
    MEASURED left-side key skew: the salted form replicates the right
    side ``n_salts`` times, a real cost a uniform input should never
    pay, while a key above ``skew_threshold`` of the left rows is one
    straggler reducer at scale. :func:`max_key_share` proves which case
    holds with narrow column-pruned probe jobs; the result is identical
    either way (salted == plain is the driver-gated identity,
    query salted_join_revenue)."""
    share = max_key_share(left.select(on), on, skew_threshold)
    if share > skew_threshold:
        return salted_join(left, right, on, n_salts, how, salt_by)
    return left.join(right, on, how)
