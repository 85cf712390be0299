"""Similarity search over an embedding column (array<float>).

- brute_force_topk: exact cosine top-k against one query vector. The
  dot product folds left-to-right in DOUBLE via F.aggregate — the same
  sequential order DuckDB's list_cosine_similarity uses, so the oracle
  matches to the last bit (rounded defensively anyway).
- lsh_bucket_ann / lsh_candidate_pairs: random-hyperplane LSH. The
  hyperplanes are derived from a seeded numpy RNG broadcast into a
  pandas UDF — the scale path: shuffle on bucket id only, candidates
  compared within buckets.
- embedding_near_dups: cosine near-duplicate pairs via LSH buckets.

Scale notes: brute force is O(n) per query (a map + top-k, no shuffle;
fine for one query vector, wrong for n x n). The bucketed variants are
the 10^12-row path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def cosine_to(query: list[float]):
    """Column: cosine(embedding, query) folded sequentially in double."""
    q = [float(x) for x in query]
    qnorm = float(np.sqrt(np.dot(q, q)))
    qcol = F.array(*[F.lit(x) for x in q])
    dot = F.aggregate(
        F.zip_with(F.col("embedding"), qcol, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = F.sqrt(
        F.aggregate(
            F.col("embedding"),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    return dot / (norm * F.lit(qnorm))


def brute_force_topk(
    emb: DataFrame, query: list[float], k: int = 10, id_col: str = "vec_id"
) -> DataFrame:
    """Exact top-k by cosine: map-side score + global top-k (sort-limit
    is optimized to per-partition top-k + driver merge; no full sort)."""
    return (
        emb.select(F.col(id_col), cosine_to(query).alias("cosine"))
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((n_planes, dim)).astype(np.float64)


def with_lsh_bucket(
    emb: DataFrame,
    dim: int,
    n_planes: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
) -> DataFrame:
    """Append a random-hyperplane LSH bucket id (sign pattern -> int).

    The plane matrix is tiny (n_planes x dim) and regenerated
    deterministically inside each Python worker — the executor-side
    broadcast idiom.
    """

    @F.pandas_udf(T.IntegerType())
    def _bucket(vecs: pd.Series) -> pd.Series:
        planes = _hyperplanes(dim, n_planes, seed)
        m = np.stack(vecs.to_numpy())  # (batch, dim) float32
        signs = (m.astype(np.float64) @ planes.T) > 0  # (batch, n_planes)
        weights = (1 << np.arange(n_planes, dtype=np.int64))[None, :]
        return pd.Series((signs * weights).sum(axis=1).astype(np.int32), index=vecs.index)

    return emb.withColumn("bucket", _bucket(F.col("embedding")))


def lsh_bucket_ann(
    emb: DataFrame,
    query: list[float],
    dim: int,
    k: int = 10,
    n_planes: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN: score only vectors in the query's LSH bucket (partition-
    pruned scan if the table is written partitioned by bucket)."""
    planes = _hyperplanes(dim, n_planes, seed)
    signs = (planes @ np.asarray(query, dtype=np.float64)) > 0
    qbucket = int((signs * (1 << np.arange(n_planes))).sum())
    bucketed = with_lsh_bucket(emb, dim, n_planes, seed, id_col)
    return (
        bucketed.where(F.col("bucket") == qbucket)
        .select(F.col(id_col), cosine_to(query).alias("cosine"))
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def _ivf_centroids(dim: int, n_cells: int, seed: int) -> np.ndarray:
    """Deterministic coarse quantizer: unit-norm random centroids.

    A trained k-means codebook would come from a sample pass; for a
    seeded, training-free engine the random codebook gives the same
    partition-pruning structure (cells are Voronoi regions).
    """
    c = np.random.default_rng(seed).standard_normal((n_cells, dim))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def with_ivf_cell(
    emb: DataFrame, dim: int, n_cells: int = 16, seed: int = 7, id_col: str = "vec_id"
) -> DataFrame:
    """Append the IVF cell id (argmax centroid dot product)."""

    @F.pandas_udf(T.IntegerType())
    def _cell(vecs: pd.Series) -> pd.Series:
        cents = _ivf_centroids(dim, n_cells, seed)
        m = np.stack(vecs.to_numpy()).astype(np.float64)
        return pd.Series(np.argmax(m @ cents.T, axis=1).astype(np.int32), index=vecs.index)

    return emb.withColumn("ivf_cell", _cell(F.col("embedding")))


def ivf_ann(
    emb: DataFrame,
    query: list[float],
    dim: int,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 7,
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF approximate nearest neighbours: score only vectors whose cell
    is among the query's n_probe closest centroids.

    Scale path: write the table partitioned by ivf_cell and the probe
    filter becomes partition pruning — the scan reads n_probe/n_cells
    of the data before any compute.
    """
    cents = _ivf_centroids(dim, n_cells, seed)
    scores = cents @ np.asarray(query, dtype=np.float64)
    probes = [int(i) for i in np.argsort(-scores)[:n_probe]]
    celled = with_ivf_cell(emb, dim, n_cells, seed, id_col)
    return (
        celled.where(F.col("ivf_cell").isin(probes))
        .select(F.col(id_col), cosine_to(query).alias("cosine"))
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    dim: int,
    min_cosine: float = 0.95,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
) -> DataFrame:
    """Near-duplicate vector pairs: equi-join within LSH buckets, then
    exact cosine filter — O(sum bucket^2), never n^2."""
    b = with_lsh_bucket(emb, dim, n_planes, seed, id_col)
    l = b.select(
        F.col("bucket"),
        F.col(id_col).alias("id_a"),
        F.col("embedding").alias("emb_a"),
    )
    r = b.select(
        F.col("bucket"),
        F.col(id_col).alias("id_b"),
        F.col("embedding").alias("emb_b"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("emb_a"), F.col("emb_b"), lambda a, x: a.cast("double") * x),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )

    def _norm(c):
        return F.sqrt(
            F.aggregate(
                F.col(c), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
            )
        )

    return (
        l.join(r, ["bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", dot / (_norm("emb_a") * _norm("emb_b")))
        .where(F.col("cosine") >= min_cosine)
        .select("id_a", "id_b", "cosine")
    )
