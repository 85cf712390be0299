"""Product quantization: recall vs brute force, code compactness,
determinism, empty-table totality."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from gobulk_spark.operators.similarity import (
    brute_force_topk,
    fit_pq_codebook,
    pq_ann,
    pq_encode,
)

SF = "/root/testdata/sf0.01/embeddings.parquet"


def test_pq_recall_at_10_vs_brute_force(spark):
    emb = spark.read.parquet(SF)
    query = emb.where(F.col("vec_id") == 0).first()["embedding"]
    dim = len(query)
    base = emb.where(F.col("vec_id") != 0)
    exact = {
        r["vec_id"] for r in brute_force_topk(base, list(query), k=10).collect()
    }
    raw = {
        r["vec_id"]
        for r in pq_ann(base, list(query), dim, k=10, rerank_factor=0).collect()
    }
    # 8 bytes out of 256: raw ADC is lossy by design (measured 0.6)
    assert len(exact & raw) / 10 >= 0.5, (exact, raw)
    reranked = {
        r["vec_id"]
        for r in pq_ann(base, list(query), dim, k=10, rerank_factor=10).collect()
    }
    # the two-stage shape: ADC shortlist + exact re-rank of 100 rows
    assert len(exact & reranked) / 10 >= 0.9, (exact, reranked)


def test_pq_codes_are_compact_and_deterministic(spark):
    emb = spark.read.parquet(SF).limit(200)
    dim = len(emb.first()["embedding"])
    cb = fit_pq_codebook(emb, dim, n_sub=8, n_codes=16, sample_size=200)
    assert cb.shape == (8, 16, dim // 8)
    a = {r["vec_id"]: list(r["codes"]) for r in pq_encode(emb, cb).collect()}
    b = {r["vec_id"]: list(r["codes"]) for r in pq_encode(emb, cb).collect()}
    assert a == b  # same codebook -> identical codes, partition-independent
    assert all(len(c) == 8 for c in a.values())  # 8 bytes per vector
    assert all(0 <= x < 16 for c in a.values() for x in c)


def test_pq_reconstruction_beats_random_codebook(spark):
    """Trained codebooks must reconstruct (much) better than the seeded
    random fallback — the same trained-vs-random contract as IVF."""
    emb = spark.read.parquet(SF)
    dim = len(emb.first()["embedding"])
    rows = np.stack(
        [r["embedding"] for r in emb.limit(500).collect()]
    ).astype(np.float64)
    rows /= np.maximum(np.linalg.norm(rows, axis=1, keepdims=True), 1e-12)

    def mse(cb):
        n_sub, _, sub_dim = cb.shape
        err = 0.0
        for s in range(n_sub):
            x = rows[:, s * sub_dim : (s + 1) * sub_dim]
            d2 = -2.0 * (x @ cb[s].T) + (cb[s] * cb[s]).sum(axis=1)
            err += (np.min(d2, axis=1) + (x * x).sum(axis=1)).sum()
        return err / len(rows)

    trained = fit_pq_codebook(emb, dim, n_sub=8, n_codes=64)
    # the standard baseline: centroids are random DATA subvectors with
    # no k-means refinement (a gaussian codebook is far worse still)
    rng = np.random.default_rng(123)
    sub_dim = dim // 8
    datapts = np.stack(
        [
            rows[rng.choice(len(rows), 64), s * sub_dim : (s + 1) * sub_dim]
            for s in range(8)
        ]
    )
    assert mse(trained) < 0.8 * mse(datapts)  # measured 0.325 vs 0.472


def test_pq_over_empty_table_returns_empty(spark):
    emb = spark.createDataFrame(
        [], "vec_id long, embedding array<float>"
    )
    out = pq_ann(emb, [1.0] * 64, 64, k=5)
    assert out.count() == 0


def test_ivfpq_probe_all_equals_plain_pq(spark):
    """n_probe == n_cells scans everything — IVF-PQ must then return
    exactly the plain PQ result (the composition adds pruning, never
    different scoring)."""
    from gobulk_spark.operators.similarity import ivfpq_ann

    emb = spark.read.parquet(SF)
    query = emb.where(F.col("vec_id") == 0).first()["embedding"]
    dim = len(query)
    base = emb.where(F.col("vec_id") != 0)
    full = ivfpq_ann(base, list(query), dim, k=10, n_cells=8, n_probe=8)
    plain = pq_ann(base, list(query), dim, k=10)
    assert [tuple(r) for r in full.collect()] == [
        tuple(r) for r in plain.collect()
    ]


def test_ivfpq_matches_exact_ivf_on_same_probes(spark):
    """The PQ stage of the composition must lose (almost) nothing
    relative to EXACT scoring over the same probed cells — probe loss
    itself is IVF's documented property (on these largely-isotropic
    driver embeddings, absolute recall ~= the probe fraction for ANY
    cell scheme; the noise-floor boundary in BASELINE.md)."""
    from gobulk_spark.operators.similarity import ivf_ann, ivfpq_ann

    emb = spark.read.parquet(SF)
    query = emb.where(F.col("vec_id") == 0).first()["embedding"]
    dim = len(query)
    base = emb.where(F.col("vec_id") != 0)
    exact_ivf = {
        r["vec_id"]
        for r in ivf_ann(
            base, list(query), dim, k=10, n_cells=16, n_probe=4
        ).collect()
    }
    got = {
        r["vec_id"]
        for r in ivfpq_ann(
            base, list(query), dim, k=10, n_cells=16, n_probe=4
        ).collect()
    }
    assert len(exact_ivf & got) / 10 >= 0.9, (exact_ivf, got)
