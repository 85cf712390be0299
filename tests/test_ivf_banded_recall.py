"""IVF-scoped banded LSH: recall at LOW cosine thresholds and large n.

The round-2 verdict's builder-candidate #8: band_sizing's amplification
math hits the max_bands=64 cap once n grows at low thresholds (at
n=2x10^4 and cosine 0.4 it wants ~365 bands), so plain banding's recall
collapses exactly where the corpus is largest. Scoping banding inside
trained IVF cells (multi-probe so boundary pairs still co-occur)
shrinks the per-table n, lowers the plane count, and brings the target
recall back inside the cap — measured here against the exact numpy
all-pairs baseline on a 20k clustered corpus.
"""

from __future__ import annotations

import numpy as np
import pytest

from gobulk_spark.operators.similarity import (
    band_sizing,
    embedding_near_dup_pairs,
    embedding_near_dup_pairs_ivf,
    ivf_cells_for_band_budget,
)

N, DIM, THRESH = 20000, 64, 0.55


def _clustered(n=N, dim=DIM, n_groups=2500, gsize=3, noise=0.12, seed=3):
    """2500 tight near-dup groups (within-group cosine ~0.55-0.7) over a
    random background — the shape real near-dup embedding tables have.

    Threshold note (measured, not assumed): at dim=64 a cosine of 0.4
    sits ~3.2 sigma above RANDOM-pair similarity, so a 20k corpus holds
    ~10^5 accidental isotropic pairs at 0.4 that no partitioner can
    co-locate (the LSH lower bound: ~n^rho tables at that gap). The
    meaningful low-threshold regime is structure above the noise floor
    — this corpus puts 92% of its 0.55-pairs inside groups.
    """
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_groups, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    v = centers[np.repeat(np.arange(n_groups), gsize)] + noise * rng.standard_normal(
        (n_groups * gsize, dim)
    )
    bg = rng.standard_normal((n - n_groups * gsize, dim))
    v = np.vstack([v, bg])
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return v.astype(np.float32)


def _exact_pairs(v, thresh, block=2000):
    vn = v.astype(np.float64)
    out = set()
    for i0 in range(0, len(vn), block):
        sims = vn[i0 : i0 + block] @ vn.T
        ii, jj = np.nonzero(sims >= thresh)
        for a, b in zip(ii + i0, jj):
            if a < b:
                out.add((int(a), int(b)))
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    v = _clustered()
    exact = _exact_pairs(v, THRESH)
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in row]) for i, row in enumerate(v)],
        "vec_id long, embedding array<float>",
    ).repartition(16)
    df = df.persist()
    df.count()
    return df, exact


def test_band_budget_math():
    # at this (n, threshold) plain banding needs far more than 64 bands
    b, r = band_sizing(N, THRESH, max_bands=10_000)
    assert b > 64
    cells = ivf_cells_for_band_budget(N, THRESH)
    assert cells > 1
    # and high thresholds / small n degenerate to plain banding
    assert ivf_cells_for_band_budget(2000, 0.95) == 1


def test_ivf_scoped_banding_meets_recall_where_plain_collapses(corpus):
    df, exact = corpus
    assert len(exact) > 300, "corpus must contain a healthy pair set"
    plain = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs(
            df, DIM, min_cosine=THRESH, max_bucket_size=64
        ).collect()
    }
    ivf = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs_ivf(
            df, DIM, min_cosine=THRESH, n_rows=N, max_bucket_size=64
        ).collect()
    }
    # precision is 1.0 for both (exact cosine verify inside the operator)
    assert plain <= exact and ivf <= exact
    recall_plain = len(plain) / len(exact)
    recall_ivf = len(ivf) / len(exact)
    # the round-3 done-bar (measured 0.907 ivf vs 0.738 plain): the
    # IVF-scoped variant restores the recall target INSIDE max_bands=64
    # on a corpus where plain banding's cap demonstrably binds
    assert recall_ivf >= 0.88, f"ivf recall {recall_ivf:.3f}"
    assert recall_plain <= 0.8, (
        f"plain recall {recall_plain:.3f} — if this now passes, the cap "
        "no longer binds here and the test corpus must grow"
    )
    assert recall_ivf > recall_plain + 0.1
