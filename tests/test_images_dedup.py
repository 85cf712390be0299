"""Image near-dup detection over perceptual hashes (operators/images.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from gobulk_spark.corpus import generate_pairs
from gobulk_spark.operators.images import (
    phash_dedup_survivors,
    phash_near_dup_images,
)


@pytest.fixture(scope="module")
def images(spark):
    pairs_t, _ = generate_pairs(400, seed=42)
    pdf = pairs_t.to_pandas()[["image_id", "phash"]]
    return spark.createDataFrame(pdf), pdf


def _popcount64(x: np.ndarray) -> np.ndarray:
    # numpy<2 has no bitwise_count; unpackbits over the uint8 view
    return np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1).sum(axis=1)


def _exact_pairs(pdf: pd.DataFrame, max_hamming: int) -> set[tuple[str, str, int]]:
    ids = pdf["image_id"].to_numpy()
    ph = pdf["phash"].to_numpy().astype(np.uint64)
    out = set()
    for i in range(len(ids)):
        ham = _popcount64(np.ascontiguousarray(ph[i] ^ ph[i + 1 :]))
        for j in np.nonzero(ham <= max_hamming)[0]:
            a, b = ids[i], ids[i + 1 + j]
            if a > b:
                a, b = b, a
            out.add((a, b, int(ham[j])))
    return out


def test_phash_pairs_equal_exact_allpairs(images):
    """Guard off -> pigeonhole recall 1.0: the banded result must equal
    the exact 64-bit hamming scan, including the planted hot-bucket
    skew rows (60% of the corpus in 8 buckets)."""
    df, pdf = images
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in phash_near_dup_images(
            df, max_hamming=4, max_bucket_size=None, n_rows=len(pdf)
        ).collect()
    }
    want = _exact_pairs(pdf, 4)
    assert got == want and len(want) > 100  # the skew makes pairs plentiful


def test_phash_hot_bucket_guard_trips_on_planted_skew(images):
    """The guard exists FOR this corpus shape: 8 planted hot buckets
    each hold ~7.5% of rows. At this test's n=400 a hot bucket (~30
    rows) sits under the auto guard's 64-row floor (auto trips once a
    bucket tops 64, i.e. n >~ 900 at this skew), so the guard is
    pinned here to show the mechanism: guarded drops the hot-bucket
    cliques the guard-off run keeps."""
    df, pdf = images
    guarded = phash_near_dup_images(
        df, max_hamming=4, max_bucket_size=16, n_rows=len(pdf)
    ).count()
    unguarded = phash_near_dup_images(
        df, max_hamming=4, max_bucket_size=None, n_rows=len(pdf)
    ).count()
    assert guarded < unguarded


def test_phash_survivors_keep_min_id_per_cluster(images):
    """Suppression: exactly one survivor (the min image_id) per
    connected component, all non-dup rows untouched."""
    df, pdf = images
    surv = set(
        r["image_id"]
        for r in phash_dedup_survivors(
            df, max_hamming=4, max_bucket_size=None
        ).collect()
    )
    # reference union-find over the exact pairs
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b, _ in _exact_pairs(pdf, 4):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    victims = {n for n in parent if find(n) != n}
    assert surv == set(pdf["image_id"]) - victims
    assert len(victims) > 0


def test_connected_components_string_ids(spark):
    """The CC machinery is node-type generic (round 5): string ids must
    survive both the driver union-find path and the distributed
    pointer-jumping path with identical min-label output."""
    from gobulk_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [("b", "c"), ("c", "d"), ("x", "y")], "id_a string, id_b string"
    )
    want = {"b": "b", "c": "b", "d": "b", "x": "x", "y": "x"}
    for thresh in (65536, 0):  # driver path, then distributed path
        got = {
            r["node"]: r["cluster_id"]
            for r in connected_components(edges, driver_threshold=thresh).collect()
        }
        assert got == want, f"threshold={thresh}"
