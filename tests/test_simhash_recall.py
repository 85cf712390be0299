"""Simhash near-dup recall at the flagship radius, vs the exact scan.

Round-2 verdict: 4x16 banding guarantees recall only to hamming 3, but
the driver query asks for max_hamming=16 — pairs at distance 4-16 were
found only by luck. simhash_band_plan now sizes bands to the radius
(pigeonhole: max_hamming+1 bands -> any qualifying pair has a clean
band), and this suite measures recall against the exact all-pairs
baseline on the same table the driver query runs (sf0.01 documents).
"""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from gobulk_spark.operators.text import (
    SIMHASH_BITS,
    simhash,
    simhash_band_plan,
    simhash_near_dups,
)

SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.01")
DOCS = os.path.join(SF_DIR, "documents.parquet")


def test_band_plan_covers_radius_and_all_bits():
    for max_hamming in (0, 1, 3, 8, 16, 31, 63):
        plan = simhash_band_plan(max_hamming)
        assert len(plan) == max_hamming + 1
        assert sum(w for _, w in plan) == SIMHASH_BITS
        # contiguous, non-overlapping coverage of the 64 bits
        off = 0
        for o, w in plan:
            assert o == off and w >= 1
            off += w


def test_band_plan_pigeonhole_property():
    """Any pair within the radius has >=1 band differing by at most the
    probe radius (the recall-guarantee mechanism, checked on random
    signatures for exact-match banding AND the multi-probe plans)."""
    rng = np.random.default_rng(7)
    for max_hamming in (3, 8, 16):
        for t in (0, 1, 2, 3):
            plan = simhash_band_plan(max_hamming, probe_radius=t)
            base = rng.integers(0, 2**63, size=200, dtype=np.int64)
            for d in (1, max_hamming // 2, max_hamming):
                flips = np.zeros_like(base)
                for row in range(len(base)):
                    bits = rng.choice(64, size=d, replace=False)
                    for b in bits:
                        flips[row] ^= np.int64(1) << np.int64(int(b))
                xor = flips.astype(np.uint64)
                found = np.zeros(len(base), dtype=bool)
                for off, w in plan:
                    seg = (xor >> np.uint64(off)) & np.uint64((1 << w) - 1)
                    pop = np.array([bin(int(x)).count("1") for x in seg])
                    found |= pop <= t
                assert found.all(), f"radius {max_hamming}, t={t}, d={d}"


def test_band_plan_rejects_out_of_range():
    with pytest.raises(ValueError):
        simhash_band_plan(64)
    with pytest.raises(ValueError):
        simhash_band_plan(-1)


@pytest.mark.skipif(not os.path.exists(DOCS), reason="driver testdata absent")
def test_recall_vs_exact_at_flagship_radius(spark):
    """Operator recall >= 0.9 (and exact hamming correctness) at
    max_hamming=16 on the driver's own table — the round-3 gate."""
    docs = spark.read.parquet(DOCS).select("doc_id", "text")
    sig = simhash(docs, "doc_id", "text").persist()
    try:
        l, r = sig.alias("l"), sig.alias("r")
        ham = F.bit_count(F.col("l.simhash").bitwiseXOR(F.col("r.simhash")))
        exact = {
            (row.id_a, row.id_b, row.hamming)
            for row in (
                l.join(r, F.col("l.doc_id") < F.col("r.doc_id"))
                .select(
                    F.col("l.doc_id").alias("id_a"),
                    F.col("r.doc_id").alias("id_b"),
                    ham.alias("hamming"),
                )
                .where(F.col("hamming") <= 16)
                .collect()
            )
        }
        got = {
            (row.id_a, row.id_b, row.hamming)
            for row in simhash_near_dups(sig, "doc_id", max_hamming=16).collect()
        }
    finally:
        sig.unpersist()
    assert exact, "baseline found no pairs — corpus/radius mismatch"
    # precision is 1.0 by construction (hamming computed from the true
    # signatures); every emitted pair must be a true pair
    assert got <= exact
    recall = len(got & exact) / len(exact)
    assert recall >= 0.9, f"recall {recall:.3f} over {len(exact)} true pairs"


@pytest.mark.skipif(not os.path.exists(DOCS), reason="driver testdata absent")
def test_guard_none_is_lossless_and_tight_radius_subsets(spark):
    docs = spark.read.parquet(DOCS).select("doc_id", "text").limit(200)
    sig = simhash(docs, "doc_id", "text").persist()
    try:
        unguarded = {
            (row.id_a, row.id_b)
            for row in simhash_near_dups(
                sig, "doc_id", max_hamming=10, max_bucket_size=None
            ).collect()
        }
        guarded = {
            (row.id_a, row.id_b)
            for row in simhash_near_dups(sig, "doc_id", max_hamming=10).collect()
        }
        tighter = {
            (row.id_a, row.id_b)
            for row in simhash_near_dups(
                sig, "doc_id", max_hamming=4, max_bucket_size=None
            ).collect()
        }
    finally:
        sig.unpersist()
    assert guarded <= unguarded
    assert tighter <= unguarded


@pytest.mark.skipif(not os.path.exists(DOCS), reason="driver testdata absent")
def test_multi_probe_plans_are_lossless_unguarded(spark):
    """probe_radius 1/2 (the large-n plans) must find exactly the t=0
    pair set when the guard is off — the generalized pigeonhole is a
    guarantee, not an approximation."""
    docs = spark.read.parquet(DOCS).select("doc_id", "text").limit(300)
    sig = simhash(docs, "doc_id", "text").persist()
    try:
        sets = {}
        for t in (0, 1, 2):
            sets[t] = {
                (r.id_a, r.id_b, r.hamming)
                for r in simhash_near_dups(
                    sig, "doc_id", max_hamming=12,
                    max_bucket_size=None, probe_radius=t,
                ).collect()
            }
    finally:
        sig.unpersist()
    assert sets[0], "no pairs at radius 12 — corpus drift"
    assert sets[1] == sets[0]
    assert sets[2] == sets[0]


@pytest.mark.skipif(not os.path.exists(DOCS), reason="driver testdata absent")
def test_broadcast_minband_path_equals_shuffled_distinct_path(spark):
    """Round 6: the broadcastable regime emits each pair once via the
    first-qualifying-band condition (no terminal distinct) with the
    index side broadcast; above the row cap the operator keeps the
    shuffled join + distinct. Both paths must produce the identical
    pair set — including when the auto hot-bucket guard FIRES (a
    planted 90-doc identical-signature cluster overflows every one of
    its band buckets at the auto threshold of 64), exercising the
    per-doc survivor bitmasks the min-band condition consults."""
    from gobulk_spark.operators import text as textmod

    docs = spark.read.parquet(DOCS).select("doc_id", "text").limit(300)
    sig = simhash(docs, "doc_id", "text")
    # plant a hot cluster: 90 extra rows sharing one signature
    hot = (
        spark.range(1_000_000, 1_000_090)
        .select(F.col("id").alias("doc_id"))
        .withColumn("simhash", F.lit(0x1234_5678_9ABC_DEF0))
    )
    sig = sig.select("doc_id", "simhash").unionByName(hot).persist()
    try:
        n = sig.count()
        kwargs = dict(max_hamming=12, n_rows=n, max_bucket_size=64)
        bc = {
            (r.id_a, r.id_b, r.hamming)
            for r in simhash_near_dups(sig, "doc_id", **kwargs).collect()
        }
        old_cap = textmod.SIMHASH_BROADCAST_INDEX_ROWS
        textmod.SIMHASH_BROADCAST_INDEX_ROWS = 0
        try:
            shuffled = {
                (r.id_a, r.id_b, r.hamming)
                for r in simhash_near_dups(sig, "doc_id", **kwargs).collect()
            }
        finally:
            textmod.SIMHASH_BROADCAST_INDEX_ROWS = old_cap
    finally:
        sig.unpersist()
    assert bc == shuffled
    # the guard must actually have fired for this to test the masks:
    # the planted cluster's pairs (hamming 0) are suppressed
    planted = {(a, b) for a in range(1_000_000, 1_000_090)
               for b in range(a + 1, 1_000_090)}
    assert not planted & {(a, b) for a, b, _ in bc}


@pytest.mark.skipif(not os.path.exists(DOCS), reason="driver testdata absent")
def test_simhash_vote_paths_agree(spark):
    """Round 6: the UDF's dense (bincount+matmul) and sparse (per-bit
    weighted bincount) vote accumulators must produce identical
    signatures — the sparse path is the bounded-memory fallback for
    large per-batch vocabularies and never fires on the small test
    corpora unless forced."""
    from gobulk_spark.operators import text as textmod

    docs = spark.read.parquet(DOCS).select("doc_id", "text").limit(200)
    dense = {r.doc_id: r.simhash for r in simhash(docs, "doc_id", "text").collect()}
    old = textmod.SIMHASH_DENSE_VOTE_CELLS
    textmod.SIMHASH_DENSE_VOTE_CELLS = 0  # force the per-bit path
    try:
        sparse = {
            r.doc_id: r.simhash for r in simhash(docs, "doc_id", "text").collect()
        }
    finally:
        textmod.SIMHASH_DENSE_VOTE_CELLS = old
    assert dense == sparse and len(dense) == 200
