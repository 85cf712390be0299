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
