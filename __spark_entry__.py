"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship quality-filter over sf0.001 documents.
``queries()`` exposes one callable per implemented operator (SURVEY §2 +
the training-data operator set); ``oracle_sql()`` gives the DuckDB
equivalent for every SQL-expressible one. Column names/aliases match
between both sides; float aggregates are rounded identically on both
sides to keep value-hashes stable.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:  # driver-side import works from any cwd
    sys.path.insert(0, _REPO)

STOPLIST = ("the", "a")

def _ship_package(spark: SparkSession) -> None:
    """Make gobulk_spark importable on executor Python workers.

    Delegates to gobulk_spark.deploy.ship (content-hash-named zip,
    idempotent per application, no-op under spark-submit --py-files) —
    ONE shipping implementation, not three.
    """
    from gobulk_spark.deploy import ship

    ship(spark)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    _ship_package(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# flagship: the real engine (langid + perplexity + heuristic rules) over the
# documents table as a caption corpus — Arrow-vectorized, not SQL-expressible
# --------------------------------------------------------------------------


def _flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gobulk_spark.functions import textstats
        from gobulk_spark.models import langid, perplexity

        for pdf in batches:
            text = pdf["text"]
            lid = langid.predict(text)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "lang_pred": lid["lang"],
                    "lang_conf": lid["lang_conf"],
                    "ppl": perplexity.score(text),
                    "n_words": textstats.n_words(text),
                    "max_word_freq_ratio": textstats.max_word_freq_ratio(text),
                }
            )

    # Catalyst cannot prune columns through an opaque UDF: project to the
    # two columns the stage reads BEFORE mapInPandas so the parquet scan
    # (ReadSchema) carries doc_id+text only. spread() the projection
    # before the opaque stage — the documents table is one parquet row
    # group, so without it the whole langid+perplexity pass runs in ONE
    # task (operators/text.spread rationale; round 6).
    from gobulk_spark.operators.text import spread

    docs = spread(_t(spark, sf_dir, "documents"), "doc_id").select(
        "doc_id", "text"
    )
    feats = docs.mapInPandas(
        stage,
        schema="doc_id long, lang_pred string, lang_conf double, ppl double, "
        "n_words long, max_word_freq_ratio double",
    )
    return (
        feats.withColumn(
            "keep",
            (F.col("n_words") >= 10)
            & (F.col("max_word_freq_ratio") <= 0.5)
            & (F.col("ppl") < 1e9),
        )
        .groupBy("lang_pred", "keep")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("ppl"), 4).alias("avg_ppl"),
        )
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _flagship(spark, "/root/testdata/sf0.001")


# --------------------------------------------------------------------------
# SQL-checkable operator queries
# --------------------------------------------------------------------------


def q_quality_rule_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic keep/drop CASE chain (rules.py P1 analogue, JVM-side)."""
    d = _t(spark, sf_dir, "documents")
    n_chars = F.length("text")
    n_tokens = F.size(F.split(F.trim("text"), " +")).cast("long")
    reason = (
        F.when(n_chars < 80, "too_short")
        .when(n_chars > 380, "too_long")
        .when(n_tokens < 15, "too_few_tokens")
        .otherwise(F.lit(None).cast("string"))
    )
    return d.select(
        "doc_id",
        reason.alias("drop_reason"),
        reason.isNull().alias("keep"),
    )


def q_language_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg(F.length("text")), 4).alias("avg_chars"),
    )


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gobulk_spark.operators.text import distinct_token_count, token_count

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count(F.col("text")).cast("long").alias("n_tokens"),
        distinct_token_count(F.col("text")).cast("long").alias("n_distinct_tokens"),
    )


def q_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc BPE-ish piece counts (LLM token-budget unit) alongside
    whitespace tokens — JVM regexp_extract_all, no Python."""
    from gobulk_spark.operators.text import bpe_piece_count, token_count

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        bpe_piece_count(F.col("text")).cast("long").alias("n_bpe_pieces"),
        token_count(F.col("text")).cast("long").alias("n_ws_tokens"),
    )


def q_fingerprint_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by md5 fingerprint per source (K1 analogue)."""
    d = _t(spark, sf_dir, "documents")
    from gobulk_spark.operators.text import fingerprint

    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct(fingerprint(F.col("text"))).alias("n_unique_fp"),
    )


def q_stopword_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gobulk_spark.operators.text import stopword_density

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", stopword_density(F.col("text"), STOPLIST).alias("stopword_density")
    )


def q_max_token_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gobulk_spark.operators.text import max_token_freq

    d = _t(spark, sf_dir, "documents")
    return max_token_freq(d, "doc_id", "text")


def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gobulk_spark.operators.dedup import ngram_jaccard_pairs

    d = _t(spark, sf_dir, "documents")
    out = ngram_jaccard_pairs(
        d, "doc_id", "text", shingle_n=2, min_jaccard=0.08, max_shingle_df=64
    )
    return out.select(
        "id_a", "id_b", "n_common", F.round("jaccard", 6).alias("jaccard")
    )


def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gobulk_spark.operators.dedup import minhash_signatures

    d = _t(spark, sf_dir, "documents")
    return minhash_signatures(d, "doc_id", "text", num_hashes=8, shingle_n=2)


def q_minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gobulk_spark.operators.dedup import minhash_lsh_candidates

    d = _t(spark, sf_dir, "documents")
    return minhash_lsh_candidates(
        d, "doc_id", "text", num_hashes=8, shingle_n=2, max_bucket_size=64
    )


def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gobulk_spark.operators.similarity import brute_force_topk

    e = _t(spark, sf_dir, "embeddings")
    query = e.where(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    out = brute_force_topk(e.where(F.col("vec_id") != 0), list(query), k=10)
    return out.select("vec_id", F.round("cosine", 6).alias("cosine"))


def q_marker_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resume-marker semantics: rows not in the processed set (K5)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "left_anti")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


def q_existence_check_actions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan-phase existence lookup -> create/update (P2/P3 analogue)."""
    o = _t(spark, sf_dir, "orders")
    rich = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 5000)
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    return (
        o.join(F.broadcast(rich.withColumn("_exists", F.lit(1))), "o_custkey", "left")
        .withColumn(
            "action", F.when(F.col("_exists").isNotNull(), "update").otherwise("create")
        )
        .groupBy("action")
        .agg(F.count("*").alias("n_ops"), F.round(F.sum("o_totalprice"), 2).alias("total"))
    )


def q_changed_content_actions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash re-import classification (gobulk tracker key
    (identifier, content_hash), tracker/gorm.go:441-449; D->U->C op
    types executor.go:96-113). The simulated store holds every doc_id
    divisible by 3; those divisible by 6 carry a STALE hash (changed
    content). Incoming rows classify as:
      skip   — id exists, hash unchanged (marker filters it)
      update — id exists, hash changed, still passes rules
      delete — id exists, hash changed, now fails rules
      create — new id passing rules;  omit — new id failing them
    """
    d = _t(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.trim("text")))
    n_chars = F.length("text")
    n_tokens = F.size(F.split(F.trim("text"), " +"))
    keep = (n_chars >= 80) & (n_chars <= 380) & (n_tokens >= 15)
    incoming = d.select("doc_id", fp.alias("content_hash"), keep.alias("keep"))
    store = d.where(F.col("doc_id") % 3 == 0).select(
        "doc_id",
        F.when(F.col("doc_id") % 6 == 0, F.md5(F.concat(F.col("text"), F.lit("|v0"))))
        .otherwise(fp)
        .alias("stored_hash"),
    )
    action = (
        F.when(F.col("stored_hash").isNull() & F.col("keep"), "create")
        .when(F.col("stored_hash").isNull(), "omit")
        .when(F.col("stored_hash") == F.col("content_hash"), "skip")
        .when(F.col("keep"), "update")
        .otherwise("delete")
    )
    return (
        incoming.join(store, "doc_id", "left")
        .select(action.alias("action"))
        .groupBy("action")
        .agg(F.count("*").alias("n_ops"))
    )


def q_metrics_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type counters (C6/K3 metrics analogue)."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
        F.round(F.min("value"), 6).alias("min_value"),
        F.round(F.max("value"), 6).alias("max_value"),
    )


def q_hourly_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window counts (streaming-aggregation analogue, batch)."""
    e = _t(spark, sf_dir, "events")
    # ts is TIMESTAMP_NTZ in Spark 4; route through LTZ (session tz = UTC)
    epoch = F.col("ts").cast("timestamp").cast("long")
    hour = (F.floor(epoch / 3600) * 3600).cast("long")
    return e.groupBy(hour.alias("hour_epoch"), "event_type").agg(
        F.count("*").alias("n_events")
    )


def q_tpch_q1_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.where(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
    )


def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share per ship-year — a broadcast
    dim join (part is small) + conditional aggregation, all codegen."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(F.lit(0.0))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy(F.year(F.col("l_shipdate").cast("timestamp")).alias("ship_year"))
        .agg(
            F.round(F.sum(promo) * 100.0 / F.sum(rev), 6).alias("promo_pct"),
            F.round(F.sum(rev), 2).alias("total_revenue"),
        )
    )


def q_top_suppliers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy(F.desc("s_acctbal"), F.asc("s_name"))
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("n_name", "s_name", F.round("s_acctbal", 2).alias("acctbal"), "rk")
    )


# --------------------------------------------------------------------------
# non-SQL-expressible operators (rows-only driver check)
# --------------------------------------------------------------------------


def q_flagship_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _flagship(spark, sf_dir)


def q_simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gobulk_spark.operators.text import simhash, simhash_near_dups

    d = _t(spark, sf_dir, "documents")
    sig = simhash(d, "doc_id", "text")
    # n_rows from parquet metadata (footer-only job) lets the operator
    # size its guard + probe radius without a pass over the signatures
    return simhash_near_dups(sig, "doc_id", max_hamming=16, n_rows=d.count())


def q_embedding_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gobulk_spark.operators.similarity import lsh_bucket_ann

    e = _t(spark, sf_dir, "embeddings")
    query = e.where(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    dim = len(query)
    return lsh_bucket_ann(
        e.where(F.col("vec_id") != 0), list(query), dim, k=10, n_planes=8
    )


def q_embedding_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gobulk_spark.operators.similarity import ivf_ann

    e = _t(spark, sf_dir, "embeddings")
    query = e.where(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    return ivf_ann(
        e.where(F.col("vec_id") != 0), list(query), dim=len(query), k=10,
        n_cells=16, n_probe=4,
    )


def q_embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gobulk_spark.operators.similarity import embedding_near_dup_pairs

    e = _t(spark, sf_dir, "embeddings")
    dim = len(e.select("embedding").first()[0])
    # bands/planes auto-sized from row count via band_sizing(): plane
    # count scales bucket granularity with n (or the hot-bucket guard
    # drops every coarse bucket), band count hits target recall 0.9 at
    # the threshold. Measured 0.98 at sf0.01 and 0.95 at sf0.1 vs the
    # exact baseline. 0.4 matches embedding_exact_near_dups — the
    # driver corpus has ~zero pairs above 0.6, so a 0.6 cut proves
    # nothing.
    return embedding_near_dup_pairs(e, dim, min_cosine=0.4, max_bucket_size=64)


def q_embedding_ivf_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Low-threshold near-dups with the IVF-scoped banding (trained
    cells as the outer join key, banding within) — the shape that holds
    the recall target once n outgrows the band cap (measured 0.907 vs
    plain 0.738 on a 20k clustered corpus, tests/test_ivf_banded_recall).
    At driver scale the auto cell budget degenerates to 1 (plain
    banding suffices at n=500), so cells/probes are pinned here to
    exercise the cell-scoped path itself; rows-only (seeded planes +
    trained codebook have no SQL analogue)."""
    from gobulk_spark.operators.similarity import embedding_near_dup_pairs_ivf

    e = _t(spark, sf_dir, "embeddings")
    dim = len(e.select("embedding").first()[0])
    return embedding_near_dup_pairs_ivf(
        e, dim, min_cosine=0.4, n_cells=4, n_probe=2, max_bucket_size=64
    )


def q_embedding_near_dup_families(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both embedding near-dup pair generators (plain banded LSH and the
    IVF-cell-scoped variant) in ONE rows-only query, labelled by family
    (round-5: frees a slot inside the driver's 50-query correctness
    window for an oracle-checked entry; each family's pair recall is
    separately driver-gated in ``ann_recall_gates``)."""
    parts = (
        ("banded", q_embedding_near_dup_pairs),
        ("ivf_scoped", q_embedding_ivf_near_dups),
    )
    out = None
    for fam, fn in parts:
        df = fn(spark, sf_dir).select(
            F.lit(fam).alias("family"),
            F.col("id_a"),
            F.col("id_b"),
            F.round(F.col("cosine"), 6).alias("cosine"),
        )
        out = df if out is None else out.unionByName(df)
    return out


def q_embedding_pq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantized ANN: 8-byte codes (32x compression of float32
    dim-64), asymmetric-distance top-k via a driver-built lookup table
    (rows-only: the trained codebook is seeded numpy k-means; recall vs
    brute force is pinned in tests)."""
    from gobulk_spark.operators.similarity import pq_ann

    e = _t(spark, sf_dir, "embeddings")
    query = e.where(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    dim = len(query)
    return pq_ann(e.where(F.col("vec_id") != 0), list(query), dim, k=10)


def q_embedding_ivfpq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composed ANN (the FAISS IVFx,PQy shape): probed cells
    bound WHICH rows are scanned, 8-byte PQ codes bound WHAT is read
    per row, exact re-rank touches only the shortlist (rows-only:
    seeded k-means codebooks; probe-all==plain-PQ invariance and
    matches-exact-IVF-on-same-probes pinned in tests)."""
    from gobulk_spark.operators.similarity import ivfpq_ann

    e = _t(spark, sf_dir, "embeddings")
    query = e.where(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    dim = len(query)
    return ivfpq_ann(
        e.where(F.col("vec_id") != 0), list(query), dim, k=10,
        n_cells=16, n_probe=4,
    )


def q_embedding_ann_families(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four ANN top-k families (LSH-bucket, IVF, PQ, IVF-PQ) in ONE
    rows-only query, labelled by family. Fusing them (round-5) keeps the
    rows-only tail to three entries so every oracle-checked gate fits
    inside the driver's 50-query correctness window; each family's
    recall is separately driver-gated in ``ann_recall_gates``."""
    parts = (
        ("lsh_bucket", q_embedding_lsh_ann),
        ("ivf", q_embedding_ivf_ann),
        ("pq", q_embedding_pq_ann),
        ("ivfpq", q_embedding_ivfpq_ann),
    )
    out = None
    for fam, fn in parts:
        df = fn(spark, sf_dir).select(
            F.lit(fam).alias("family"),
            F.col("vec_id"),
            F.round(F.col("cosine"), 6).alias("cosine"),
        )
        out = df if out is None else out.unionByName(df)
    return out


# ANN recall floors as driver-visible invariants (round-4 VERDICT #6)
# --------------------------------------------------------------------------
# Each recall_* query measures its family's recall IN-ENGINE against the
# in-engine exact baseline (both deterministic by seed) and returns ONE
# row (family, floor, recall_ok); the oracle is the literal expected
# constant, so a recall regression below the floor flips recall_ok and
# fails the driver's value hash — the pytest-only recall evidence of
# round 3, promoted to the correctness gate. The driver-side loop over
# a handful of query vectors is a VALIDATION harness (the measured
# operators underneath stay fully distributed).


def _topk_recall(
    spark: SparkSession, sf_dir: str, approx, k: int = 10, n_queries: int = 4
) -> float:
    from gobulk_spark.operators.similarity import brute_force_topk

    e = _t(spark, sf_dir, "embeddings")
    qs = sorted(
        e.where(F.col("vec_id") < n_queries).select("vec_id", "embedding").collect(),
        key=lambda r: r[0],
    )
    base = e.where(F.col("vec_id") >= n_queries)
    dim = len(qs[0][1])
    hits = total = 0
    for row in qs:
        exact = {
            r[0]
            for r in brute_force_topk(base, list(row[1]), k=k)
            .select("vec_id")
            .collect()
        }
        got = {
            r[0]
            for r in approx(base, list(row[1]), dim, k).select("vec_id").collect()
        }
        hits += len(exact & got)
        total += len(exact)
    return hits / max(total, 1)


def _recall_row(
    spark: SparkSession, family: str, floor: float, recall: float
) -> DataFrame:
    return spark.createDataFrame(
        [(family, float(floor), bool(recall >= floor))],
        "family string, recall_floor double, recall_ok boolean",
    )


def q_recall_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lsh_bucket_ann's contract is EXACT top-k within the query's
    bucket — the approximation lives in candidate PRUNING, scoring is
    exact cosine. On this isotropic corpus global recall IS the
    bucket-occupancy noise floor (no partitioner co-locates isotropic
    neighbors — the LSH lower bound), so the honest driver-visible
    invariant is bucket-top-k exactness: the operator's ids must equal
    the brute-force top-k over its own bucket's members, every query."""
    from gobulk_spark.operators.similarity import (
        brute_force_topk,
        lsh_bucket_ann,
        lsh_query_bucket,
        with_lsh_bucket,
    )

    e = _t(spark, sf_dir, "embeddings")
    qs = sorted(
        e.where(F.col("vec_id") < 4).select("vec_id", "embedding").collect(),
        key=lambda r: r[0],
    )
    base = e.where(F.col("vec_id") >= 4)
    dim = len(qs[0][1])
    bucketed = with_lsh_bucket(base, dim, 8, 42, "vec_id")
    ok = True
    for row in qs:
        q = list(row[1])
        got = [
            r[0]
            for r in lsh_bucket_ann(base, q, dim, k=10, n_planes=8).collect()
        ]
        # the operator's OWN bucket function — never a local replica
        # that could drift from the candidate set actually scanned
        qbucket = lsh_query_bucket(q, dim, 8, 42)
        members = bucketed.where(F.col("bucket") == qbucket).drop("bucket")
        want = [r[0] for r in brute_force_topk(members, q, k=10).collect()]
        ok = ok and got == want
    return _recall_row(spark, "lsh_ann_bucket_topk", 1.0, 1.0 if ok else 0.0)


def q_recall_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two invariants in one frame: probe-ALL must equal brute force
    exactly (recall 1.0 — the cells partition the table), and the
    partial probe (4 of 16 cells, a 25% scan) must beat the
    random-scan baseline by ~2x even on this isotropic worst-case
    corpus (measured 0.525; clustered corpora sit far higher, see
    tests/test_ivf_banded_recall.py)."""
    from gobulk_spark.operators.similarity import fit_ivf_centroids, ivf_ann

    # ONE codebook fit for all 8 ANN calls (4 queries x 2 probes): the
    # fit is per-TABLE state (bounded sample + k-means) the operator
    # exposes for exactly this reuse — refitting per query multiplied
    # the gate's fixed cost for identical results
    e = _t(spark, sf_dir, "embeddings")
    base = e.where(F.col("vec_id") >= 4)
    dim = len(e.select("embedding").first()[0])
    cents = fit_ivf_centroids(base, dim, 16, 7)
    part = _topk_recall(
        spark, sf_dir,
        lambda df, q, dim, k: ivf_ann(
            df, q, dim=dim, k=k, n_cells=16, n_probe=4, centroids=cents
        ),
    )
    full = _topk_recall(
        spark, sf_dir,
        lambda df, q, dim, k: ivf_ann(
            df, q, dim=dim, k=k, n_cells=16, n_probe=16, centroids=cents
        ),
    )
    return _recall_row(spark, "ivf_ann_probe4", 0.45, part).unionByName(
        _recall_row(spark, "ivf_ann_probe_all", 1.0, full)
    )


def q_recall_pq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gobulk_spark.operators.similarity import fit_pq_codebook, pq_ann

    e = _t(spark, sf_dir, "embeddings")
    base = e.where(F.col("vec_id") >= 4)
    dim = len(e.select("embedding").first()[0])
    cb = fit_pq_codebook(base, dim)  # one fit for all 4 queries
    r = _topk_recall(
        spark, sf_dir, lambda df, q, dim, k: pq_ann(df, q, dim, k=k, codebook=cb)
    )
    return _recall_row(spark, "pq_ann", 0.9, r)


def q_recall_ivfpq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gobulk_spark.operators.similarity import (
        _bounded_sample_matrix,
        fit_ivf_centroids,
        fit_pq_codebook,
        ivfpq_ann,
    )

    e = _t(spark, sf_dir, "embeddings")
    base = e.where(F.col("vec_id") >= 4)
    dim = len(e.select("embedding").first()[0])
    # ONE bounded sample pass feeds both fitters (the same discipline
    # ivfpq_ann itself applies), shared by all 4 query vectors
    sample = _bounded_sample_matrix(base, "vec_id", 8192)
    cents = fit_ivf_centroids(base, dim, 16, 7, sample=sample)
    cb = fit_pq_codebook(base, dim, sample=sample)
    r = _topk_recall(
        spark, sf_dir,
        lambda df, q, dim, k: ivfpq_ann(
            df, q, dim, k=k, n_cells=16, n_probe=4, centroids=cents, codebook=cb
        ),
    )
    # isotropic worst case, 4-of-16-cell probe: measured 0.525 (the
    # cell-routing signal over the 0.25 random-scan baseline); the
    # probe-all==plain-PQ bit-for-bit invariance is pinned in test_pq.py
    return _recall_row(spark, "ivfpq_ann_probe4", 0.45, r)


def _pairs_recall(spark: SparkSession, sf_dir: str, approx_pairs) -> float:
    """Distributed pair-recall: |approx ∩ exact| / |exact| via a
    semi-join, never a driver-side pair list."""
    from gobulk_spark.operators.similarity import embedding_near_dup_pairs

    e = _t(spark, sf_dir, "embeddings")
    dim = len(e.select("embedding").first()[0])
    exact = embedding_near_dup_pairs(e, dim, min_cosine=0.4, band_planes=0).select(
        "id_a", "id_b"
    )
    appr = approx_pairs(e, dim).select("id_a", "id_b")
    n_exact = exact.count()
    n_hit = exact.join(appr, ["id_a", "id_b"], "left_semi").count()
    return n_hit / max(n_exact, 1)


def q_recall_banded_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gobulk_spark.operators.similarity import embedding_near_dup_pairs

    r = _pairs_recall(
        spark, sf_dir,
        lambda e, dim: embedding_near_dup_pairs(
            e, dim, min_cosine=0.4, max_bucket_size=64
        ),
    )
    return _recall_row(spark, "banded_near_dups", 0.9, r)


def q_recall_ivf_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gobulk_spark.operators.similarity import embedding_near_dup_pairs_ivf

    r = _pairs_recall(
        spark, sf_dir,
        lambda e, dim: embedding_near_dup_pairs_ivf(
            e, dim, min_cosine=0.4, n_cells=4, n_probe=2, max_bucket_size=64
        ),
    )
    # measured 0.932 at sf0.01; cell-sharing is the recall ceiling
    # (probe-sharing curve in tests/test_ivf_banded_recall.py)
    return _recall_row(spark, "ivf_near_dups", 0.85, r)


def q_ann_recall_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALL six ANN recall floors as ONE multi-row oracle-checked query
    (round-4 VERDICT #1): the per-family gates proved driver-visible in
    round 4, but as six separate ``queries()`` entries four of them fell
    off the driver's 50-query cap. Fused, the family cannot straddle the
    window — one entry, seven invariant rows, one literal-constant
    oracle; any recall regression flips its family's recall_ok and
    fails the value hash."""
    out = None
    for fn in (
        q_recall_lsh_ann,
        q_recall_ivf_ann,
        q_recall_pq_ann,
        q_recall_ivfpq_ann,
        q_recall_banded_near_dups,
        q_recall_ivf_near_dups,
    ):
        df = fn(spark, sf_dir)
        out = df if out is None else out.unionByName(df)
    return out


def q_ann_store_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The at-rest partition-pruned ANN stores, driver-gated (round-4
    VERDICT #4): write the sf embeddings into the cell-partitioned IVF
    layout and the bucket-partitioned LSH layout, query each PRUNED,
    and require (a) bit-for-bit equality with the in-memory operator on
    the same centroids/planes and (b) the probe predicate compiled into
    the scan's PartitionFilters (directory pruning, not a row filter).
    Oracle: the literal all-true constant — the 100-TB layout is now
    visible to CORRECTNESS, not just to the pytest plan tests."""
    from gobulk_spark.operators.similarity import (
        ivf_ann,
        ivf_ann_pruned,
        ivf_append,
        lsh_ann_pruned,
        lsh_bucket_ann,
        write_ivf_partitioned,
        write_lsh_partitioned,
    )

    e = _t(spark, sf_dir, "embeddings")
    query = e.where(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    base = e.where(F.col("vec_id") != 0)
    dim = len(query)
    q = list(query)
    # per-application store path: two concurrent sessions (driver gate
    # + a local pytest sweep) must never overwrite/read each other's
    # store mid-gate — applicationId is stable within a session, so
    # re-runs in one session still reuse/overwrite their own dirs
    root = (
        "/tmp/gobulk_spark_ann_store_gate-"
        f"{spark.sparkContext.applicationId}"
    )
    ivf_path, lsh_path = f"{root}/ivf", f"{root}/lsh"
    # resident/appended split of the SAME table: the store is built
    # from 90% of the vectors, the rest arrive later via ivf_append
    # (incremental index maintenance — no rebuild), and the pruned
    # query must equal the in-memory operator over the FULL set
    resident = base.where(F.col("vec_id") % 10 != 0)
    arriving = base.where(F.col("vec_id") % 10 == 0)
    cents = write_ivf_partitioned(resident, ivf_path, dim, n_cells=16, seed=7)
    ivf_append(arriving, ivf_path, cents)
    # self-retrieval through the NARROWEST probe: querying with an
    # APPENDED vector's own embedding at n_probe=1 must find it — the
    # probe hits exactly the cell the append should have routed to, so
    # a mis-routed appended vector fails this even when the wider
    # equality gate's probes happen to cover the wrong cell
    arr_row = arriving.orderBy("vec_id").select("vec_id", "embedding").first()
    self_hits = ivf_ann_pruned(
        spark, ivf_path, list(arr_row["embedding"]), cents, k=3, n_probe=1
    ).collect()
    append_self_found = arr_row["vec_id"] in {r["vec_id"] for r in self_hits}
    pruned = ivf_ann_pruned(spark, ivf_path, q, cents, k=10, n_probe=4)
    mem = ivf_ann(
        base, q, dim=dim, k=10, n_cells=16, n_probe=4, centroids=cents
    )
    ivf_equal = pruned.collect() == mem.collect()
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    ivf_pruned_ok = bool(pf) and any("ivf_cell" in ln for ln in pf)
    write_lsh_partitioned(base, lsh_path, dim, n_planes=8, seed=42)
    lsh_pruned = lsh_ann_pruned(spark, lsh_path, q, dim, k=10, n_planes=8)
    lsh_mem = lsh_bucket_ann(base, q, dim, k=10, n_planes=8)
    lsh_equal = lsh_pruned.collect() == lsh_mem.collect()
    lplan = lsh_pruned._jdf.queryExecution().executedPlan().toString()
    lpf = [ln for ln in lplan.splitlines() if "PartitionFilters" in ln]
    lsh_pruned_ok = bool(lpf) and any("bucket" in ln for ln in lpf)
    return spark.createDataFrame(
        [
            ("ivf_store_equals_memory", bool(ivf_equal)),
            ("ivf_store_partition_pruned", bool(ivf_pruned_ok)),
            ("ivf_append_self_retrieval", bool(append_self_found)),
            ("lsh_store_equals_memory", bool(lsh_equal)),
            ("lsh_store_partition_pruned", bool(lsh_pruned_ok)),
        ],
        "gate string, ok boolean",
    )


def q_phash_near_dup_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate IMAGE pairs (operators/images.py —
    the simhash banding machinery on the 64-bit phash column) over the
    deterministic 1500-image corpus (the sf tables carry no image
    payload; same cached corpus as the flagship gate, which this query
    ensures exists before the oracle reads it). Guard disabled: recall
    is exactly 1.0 by pigeonhole, so the banded result must equal the
    DuckDB all-pairs bit_count(xor) scan bit-for-bit — the planted
    60%-in-8-hot-buckets phash skew rides through the banding."""
    from gobulk_spark.corpus import ensure_corpus
    from gobulk_spark.operators.images import phash_near_dup_images

    path = ensure_corpus("/tmp/gobulk_spark_test_corpora/n1500", 1500, seed=42)
    imgs = spark.read.parquet(path).select("image_id", "phash")
    return phash_near_dup_images(
        imgs, max_hamming=4, max_bucket_size=None, n_rows=1500
    )


def q_flagship_f1_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship parity as an oracle-checked gate (round-4 VERDICT #6):
    run the DISTRIBUTED image+caption pipeline (decode, langid,
    perplexity, rules, scrub, dedup, lineage) over the deterministic
    1500-row corpus and compare per-image keep/drop + scrubbed captions
    against the single-node reference labeler IN-ENGINE. Returns the
    BASELINE.json contract as invariant rows (keep/drop F1 >= 0.99,
    scrub exact-match == 1.0) against a literal oracle — the F1=1.0
    evidence that previously lived only in pytest, now in CORRECTNESS.

    The corpus is cached under /tmp (same cache pytest uses); the
    driver-side pandas compare is bounded at 1,500 rows — a validation
    harness over a fully distributed run."""
    import shutil as _sh

    import pyarrow.parquet as _pq

    from gobulk_spark import lineage as _lineage
    from gobulk_spark import reference_labeler as _rl
    from gobulk_spark.config import PipelineConfig as _Cfg
    from gobulk_spark.corpus import ensure_corpus as _ensure
    from gobulk_spark.pipeline import run_pipeline as _run

    d = "/tmp/gobulk_spark_test_corpora/n1500"
    path = _ensure(d, 1500, seed=42)
    # per-application out dir: concurrent sessions must not race
    # rmtree against each other's pipeline reads (see ANN store gate)
    out = (
        "/tmp/gobulk_spark_flagship_f1_gate-"
        f"{spark.sparkContext.applicationId}"
    )
    _sh.rmtree(out, ignore_errors=True)
    _run(spark, _Cfg(source_path=path, out_dir=out, run_id="f1gate"))
    audit = _lineage.read_audit(spark, out).toPandas()
    kept = _lineage.read_kept(spark, out).toPandas()
    golden = _rl.label(_pq.read_table(path).to_pandas())
    m = audit.merge(golden, on="image_id", suffixes=("_spark", "_ref"))
    sk = m["action"] == "create"
    tp = int((sk & m["keep"]).sum())
    fp = int((sk & ~m["keep"]).sum())
    fn = int((~sk & m["keep"]).sum())
    f1 = 2 * tp / max(2 * tp + fp + fn, 1)
    ks = kept.merge(golden[["image_id", "scrubbed_caption"]], on="image_id")
    scrub_ok = (
        len(ks) == len(kept) and bool((ks["caption"] == ks["scrubbed_caption"]).all())
    )
    return spark.createDataFrame(
        [
            ("keep_drop_f1", 0.99, bool(f1 >= 0.99)),
            ("scrub_exact_match", 1.0, scrub_ok),
        ],
        "metric string, floor double, ok boolean",
    )


def q_winnow_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) containment candidates over documents —
    rolling-hash fingerprints, local positions, so partial overlap is
    detectable. Oracle-checked: _winnow_oracle_sql reproduces the
    Karp-Rabin/mix/window-select pipeline exactly in DuckDB (plus the
    property tests that pin the winnowing guarantees)."""
    from gobulk_spark.operators.text import winnow_overlap_pairs

    d = _t(spark, sf_dir, "documents")
    # k=16 char-grams: selective on natural text (k=5 matched shared
    # vocabulary and exploded to 58k candidate pairs at 500 docs);
    # measured: finds 25/25 jaccard>=0.3 pairs + 34 containment
    # candidates the whole-document measures miss
    return winnow_overlap_pairs(
        d, "doc_id", "text", k=16, window=8, min_shared=4, max_fp_df=32
    )


def q_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dedup survivor set (min-id per fingerprint) over documents."""
    from gobulk_spark.operators.dedup import dedup_exact

    d = _t(spark, sf_dir, "documents")
    return dedup_exact(d, "doc_id", "text").select("doc_id", "source")


def q_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session counts per user: gap > 30 min starts a new session
    (lag window + conditional count — the sessionization idiom)."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    # (ts, event_id) tie-break: equal timestamps within a user would make
    # lag() order-dependent — a latent flake without the second key
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("timestamp").cast("long") - F.lag(
        F.col("ts").cast("timestamp").cast("long")
    ).over(w)
    return (
        e.withColumn("new_session", (gap.isNull() | (gap > 1800)).cast("long"))
        .groupBy("user_id")
        .agg(
            F.sum("new_session").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
    )


def q_pricing_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregation (grouping-sets family) over lineitem."""
    l = _t(spark, sf_dir, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_items"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
    )


def q_event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day x event-type pivot via conditional aggregation."""
    e = _t(spark, sf_dir, "events")
    hour = F.hour(F.col("ts").cast("timestamp"))
    types = ("click", "error", "purchase", "signup", "view")
    return e.groupBy(hour.alias("hour_of_day")).agg(
        *[
            F.sum((F.col("event_type") == t).cast("long")).alias(f"n_{t}")
            for t in types
        ]
    )


def q_salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-defeating salted join (hot keys fan out over 8 reducers);
    result is provably identical to the plain join — that invariance IS
    the oracle check."""
    from gobulk_spark.operators.relational import salted_join

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"), "o_totalprice"
    )
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment"
    )
    return (
        salted_join(o, c, "custkey", n_salts=8)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by tf*ln(N/df)."""
    from gobulk_spark.operators.text import tfidf_top_terms

    d = _t(spark, sf_dir, "documents")
    return tfidf_top_terms(d, "doc_id", "text", k=3)


def q_asof_join_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time enrichment: each purchase gets the latest preceding
    page view by the same user (operators/asof.py — union + one window
    pass, no join; oracle is DuckDB's native ASOF JOIN). The view side
    is deduped per (user, ts) by max event_id so ties are well-defined
    on both engines."""
    from gobulk_spark.operators.asof import asof_join

    e = _t(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("event_id"))
    )
    out = asof_join(
        purchases, views, by="user_id", ts_col="ts",
        right_cols=("event_id", "ts"), prefix="view_", tie_break="event_id",
    )
    epoch = lambda c: F.col(c).cast("timestamp").cast("long")  # noqa: E731
    return out.select(
        "event_id",
        "user_id",
        epoch("ts").alias("purchase_epoch"),
        F.col("view_event_id"),
        (epoch("ts") - epoch("view_ts")).alias("gap_s"),
    )


def q_asof_join_salted_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SKEW-SAFE as-of variant over the same purchase/view shape,
    checked against the same DuckDB ASOF oracle — a provable-equality
    gate for the salt-then-merge-boundaries rewrite (asof_join_salted:
    time-range bucketing spreads a hot user across n_buckets window
    partitions; bucket-final snapshots carry across boundaries)."""
    from gobulk_spark.operators.asof import asof_join_salted

    e = _t(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("event_id"))
    )
    out = asof_join_salted(
        purchases, views, by="user_id", ts_col="ts",
        right_cols=("event_id", "ts"), prefix="view_", tie_break="event_id",
        n_buckets=8,
    )
    epoch = lambda c: F.col(c).cast("timestamp").cast("long")  # noqa: E731
    return out.select(
        "event_id",
        "user_id",
        epoch("ts").alias("purchase_epoch"),
        F.col("view_event_id"),
        (epoch("ts") - epoch("view_ts")).alias("gap_s"),
    )


def q_asof_join_auto_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew-ADAPTIVE as-of entry point (round-4 VERDICT #5) over the
    same purchase/view shape and the same DuckDB ASOF oracle: asof_join_auto
    probes key skew with narrow column-pruned jobs (freqItems + exact
    candidate counts) and pays the ~2x salted rewrite ONLY when a key
    exceeds the straggler threshold — either path must match the oracle
    bit-for-bit (the plain/salted equality is itself driver-gated)."""
    from gobulk_spark.operators.asof import asof_join_auto

    e = _t(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("event_id"))
    )
    out = asof_join_auto(
        purchases, views, by="user_id", ts_col="ts",
        right_cols=("event_id", "ts"), prefix="view_", tie_break="event_id",
        n_buckets=8,
    )
    epoch = lambda c: F.col(c).cast("timestamp").cast("long")  # noqa: E731
    return out.select(
        "event_id",
        "user_id",
        epoch("ts").alias("purchase_epoch"),
        F.col("view_event_id"),
        (epoch("ts") - epoch("view_ts")).alias("gap_s"),
    )


def q_asof_join_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three as-of implementations (plain union+window, salted
    skew-safe rewrite, skew-adaptive auto) over the same purchase/view
    shape, unioned with a ``variant`` tag — ONE driver entry verifies
    each variant row-for-row against the same DuckDB ASOF oracle
    (cross-joined with the three labels), freeing 50-cap slots without
    losing any per-variant coverage (round-4 VERDICT #1 fusion trick)."""
    parts = [
        q_asof_join_purchase_view(spark, sf_dir).withColumn(
            "variant", F.lit("plain")
        ),
        q_asof_join_salted_view(spark, sf_dir).withColumn(
            "variant", F.lit("salted")
        ),
        q_asof_join_auto_view(spark, sf_dir).withColumn(
            "variant", F.lit("auto")
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


#: per-process memo: both txlog driver queries share ONE store build
_TXLOG_STORES: set[str] = set()


def _ensure_txlog_events_store(spark: SparkSession, sf_dir: str):
    """Deterministic txlog table over the events table, exercising the
    full transaction-log lifecycle the driver should see: three
    range-CLUSTERED write commits (event_id mod 3, write_cluster_by
    user_id), a MERGE-shaped delete (error events under 5.00), a MERGE
    upsert (sub-20-user purchases re-priced ×2 in the same commit that
    appends two synthetic rows), OPTIMIZE cluster_by=user_id, and a
    DELETE WHERE (user_id >= 120) predicate delete whose clustered top
    range partially rides the metadata-only whole-file tier.
    image_id carries per-file bloom sidecars, so the point-lookup leg
    of the pruned query skips on blooms where min/max cannot. Rebuilt
    fresh once per process; ``value`` is carried as integer cents so
    both engines aggregate exact BIGINTs."""
    import shutil

    from gobulk_spark.txlog import TxLogKeptSink

    # per-application store path (same isolation as the ANN store
    # gate): a driver-gate session and a concurrent pytest sweep must
    # never race rmtree against each other's reads; applicationId is
    # stable within a session so the process cache still reuses it
    root = os.path.join(
        "/tmp/gobulk_spark_txlog_stores-"
        f"{spark.sparkContext.applicationId}",
        os.path.basename(os.path.normpath(sf_dir)),
    )
    sink = TxLogKeptSink(
        root,
        auto_compact_files=None,
        bloom_columns=["image_id"],
        write_cluster_by=["user_id"],
        write_cluster_files=4,
    )
    if root in _TXLOG_STORES:
        return sink
    shutil.rmtree(root, ignore_errors=True)
    e = _t(spark, sf_dir, "events").select(
        F.col("event_id").cast("string").alias("image_id"),
        F.col("event_id").alias("event_id"),
        "user_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("value_cents"),
    )
    for i in range(3):
        sink.write(e.where(F.col("event_id") % 3 == i).drop("event_id"), f"r{i}")
    victims = e.where(
        (F.col("event_type") == "error") & (F.col("value_cents") < 500)
    ).select("image_id")
    sink.delete(spark, "purge", victims)
    upd = (
        sink.read(spark)
        .where((F.col("event_type") == "purchase") & (F.col("user_id") < 20))
        .drop("run")
        .withColumn("value_cents", F.col("value_cents") * F.lit(2))
    )
    syn = spark.createDataFrame(
        [("syn-1", 15, "purchase", 111), ("syn-2", 25, "signup", 222)],
        "image_id string, user_id bigint, event_type string, value_cents bigint",
    )
    sink.merge(spark, "fixup", upd.unionByName(syn))
    sink.optimize(spark, target_file_bytes=1 << 20, cluster_by=["user_id"])
    # predicate delete AFTER compaction (DELETE WHERE): with the table
    # clustered by user_id, the top range is stats-provable, so part of
    # this delete rides the metadata-only whole-file tier (the tier
    # itself is plan-pinned in pytest; the driver checks the SEMANTICS
    # against DuckDB). At sf0.001 no user reaches 120 and the guard
    # commits nothing — consistent with the oracle's filter there
    sink.delete_where(spark, "gdpr", [("user_id", ">=", 120)])
    _TXLOG_STORES.add(root)
    return sink


def q_txlog_pruned_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip through the from-scratch transaction-log table format
    (gobulk_spark/txlog.py), driver-checked against DuckDB reading the
    ORIGINAL parquet: 3 clustered write commits + MERGE delete + MERGE
    upsert (re-price + append in one commit) + clustered OPTIMIZE +
    DELETE WHERE (user_id >= 120, partially metadata-only), then
    (a) a min/max-stats range-pruned read aggregated per event type and
    (b) a bloom-skipped image_id point lookup. Equality proves the log
    replay, both merge rewrites, the clustered compaction AND both file-
    skipping tiers are all content-exact."""
    sink = _ensure_txlog_events_store(spark, sf_dir)
    df = sink.read(
        spark, predicates=[("user_id", ">=", 10), ("user_id", "<", 40)]
    )
    rollup = df.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum("value_cents").alias("sum_cents"),
    )
    # point-lookup leg: an image_id EQUALITY read — the probe the
    # bloom sidecars skip on (min/max bounds are useless for a point
    # key once the table is clustered by user_id). The target id is
    # data-derived (max numeric id) so both engines compute it
    mx = (
        sink.read(spark)
        .agg(F.max(F.expr("try_cast(image_id as bigint)")))
        .first()[0]
    )
    point = sink.read(
        spark, predicates=[("image_id", "=", str(mx))]
    ).agg(
        F.count("*").alias("n_events"),
        F.sum("value_cents").alias("sum_cents"),
    ).select(F.lit("__point__").alias("event_type"), "n_events", "sum_cents")
    return rollup.unionByName(point)


def q_txlog_change_feed_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incremental-consumer contract, driver-checked: fold the
    row-level change feed (read_changes: inserts + deletes per commit,
    including the MERGE rewrite's deltas; optimize emits nothing)
    forward version by version into a per-type count rollup. Round 5:
    the fold runs through the CHECKPOINTED consumer
    (txlog.ChangeFeedConsumer) — one sweep per commit, each reading
    only its window and publishing rollup + cursor with an atomic
    pointer flip, so what the driver checks is the state chain's final
    PUBLICATION (materialized-view maintenance), not an in-memory fold.
    The result must equal DuckDB aggregating the surviving rows
    directly — the downstream never rescanned the table, yet lands on
    the same answer."""
    import uuid as _uuid

    from gobulk_spark.txlog import ChangeFeedConsumer

    sink = _ensure_txlog_events_store(spark, sf_dir)
    # a FRESH state dir per call (never rmtree a shared path: the
    # previous call's returned DataFrame lazily reads its state files,
    # and sf dirs must not collide); /tmp junk is bounded by the app
    state = (
        f"/tmp/gobulk_txlog_feed_state/{spark.sparkContext.applicationId}"
        f"/{_uuid.uuid4().hex[:8]}"
    )
    consumer = ChangeFeedConsumer(sink, state, ["event_type"])
    last = sink.history(spark)[-1]["version"]
    for v in range(1, last + 1):
        consumer.sweep(spark, to_version=v)
    rollup = consumer.rollup(spark)
    return rollup.select("event_type", F.col("n").cast("long").alias("n"))


def q_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per event type."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
    )


def q_embedding_exact_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs cosine near-dups (the oracle-checked baseline the
    LSH-bucketed variant approximates)."""
    from gobulk_spark.operators.similarity import embedding_near_dup_pairs

    e = _t(spark, sf_dir, "embeddings")
    dim = len(e.select("embedding").first()[0])
    # band_planes=0 => single constant-key band => true all-pairs join
    out = embedding_near_dup_pairs(e, dim, min_cosine=0.4, band_planes=0)
    return out.select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals (top-2-gram fraction, duplicate
    3-gram fraction) — zero-shuffle column expressions."""
    from gobulk_spark.operators.quality import repetition_stats

    return repetition_stats(_t(spark, sf_dir, "documents"), "doc_id", "text")


def q_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style cross-doc shared-segment stats over 8-token segments."""
    from gobulk_spark.operators.quality import segment_dedup_stats

    return segment_dedup_stats(_t(spark, sf_dir, "documents"), "doc_id", "text")


def q_per_doc_curation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """repetition_stats + segment_dedup_stats fused into one
    oracle-checked entry by a doc_id join (round 5: frees a
    driver-window slot for duplicate_token_spans; both operators keep
    their standalone tests and bench legs). Inner join: segment stats
    cover docs with >= 1 token segment."""
    a = q_repetition_stats(spark, sf_dir)
    b = q_segment_dedup(spark, sf_dir)
    return a.join(b, "doc_id")


def q_duplicate_token_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate-substring spans (Lee et al. 2021): maximal runs
    of >= 8 tokens appearing verbatim in another document, via stride-1
    window hashes + gaps-and-islands merge. The oracle re-derives the
    same spans from DuckDB list slicing."""
    from gobulk_spark.operators.quality import duplicate_token_spans

    d = _t(spark, sf_dir, "documents")
    out = duplicate_token_spans(d, "doc_id", "text", k=8)
    return out.select("doc_id", "span_start", "span_end", "span_tokens")


def q_segment_dedup_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style removal TRANSFORMATION (not just stats): every segment
    whose corpus document-frequency exceeds 1 is cut from the text,
    surviving segments keep their order. Hashes shuffle, text does not
    (operators/quality.segment_dedup_rewrite)."""
    from gobulk_spark.operators.quality import segment_dedup_rewrite

    return segment_dedup_rewrite(_t(spark, sf_dir, "documents"), "doc_id", "text")


def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing via a DISTRIBUTED PREFIX SUM
    (range-partition by md5 order, parallel per-partition cumsums,
    driver-side partition offsets) — provably equal to the oracle's
    global-window cumsum (operators/quality.pack_sequences)."""
    from gobulk_spark.operators.quality import pack_sequences

    return pack_sequences(
        _t(spark, sf_dir, "documents"), "doc_id", "text", budget=512
    )


def q_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train docs sharing a 5-gram with the eval split (doc_id % 29 == 0):
    benchmark-contamination scan with a broadcast eval side."""
    from gobulk_spark.operators.quality import contamination_check

    d = _t(spark, sf_dir, "documents")
    ev = d.where(F.col("doc_id") % 29 == 0)
    tr = d.where(F.col("doc_id") % 29 != 0)
    return contamination_check(tr, ev, "doc_id", "text", n=5)


def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic md5-based train/val/test assignment (90/5/5)."""
    from gobulk_spark.operators.quality import hash_split

    d = _t(spark, sf_dir, "documents")
    return hash_split(d, "doc_id", 0.9, 0.05).select("doc_id", "split")


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language sampling (en 50%, de 25%, rest 10%)."""
    from gobulk_spark.operators.quality import stratified_sample

    d = _t(spark, sf_dir, "documents")
    out = stratified_sample(d, "doc_id", "lang", {"en": 0.5, "de": 0.25}, 0.1)
    return out.select("doc_id", "lang")


def q_deterministic_samplers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hash_split + stratified_sample fused into one oracle-checked
    entry (round 5: frees a driver-window slot for the NB classifier
    gate; both operators keep their standalone tests and bench legs).
    Shape: (family, doc_id, tag) where tag is the split name or the
    sampled stratum."""
    a = q_hash_split(spark, sf_dir).select(
        F.lit("hash_split").alias("family"),
        "doc_id",
        F.col("split").alias("tag"),
    )
    b = q_stratified_sample(spark, sf_dir).select(
        F.lit("stratified").alias("family"),
        "doc_id",
        F.col("lang").alias("tag"),
    )
    return a.unionByName(b)


def q_nb_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seed-labeled quality-classifier distillation (FineWeb / DCLM
    recipe, engine-native): a hashed-token naive-Bayes scorer trained
    on the doc_id%3==0 third of the corpus (seed label: lang='en')
    with pure aggregations — 256 md5-bucket class counts, Laplace
    log-likelihood ratios in integer micro-units, smoothed doc-count
    prior — then applied to the held-out rest as a broadcast join +
    exact BIGINT sum. The oracle re-derives every score to the
    integer (same ln/round discipline as DSIR)."""
    from gobulk_spark.operators.quality import nb_token_classifier

    d = _t(spark, sf_dir, "documents")
    train = d.where(F.col("doc_id") % 3 == 0).withColumn(
        "_y", F.col("lang") == "en"
    )
    rest = d.where(F.col("doc_id") % 3 != 0)
    return nb_token_classifier(train, rest, "doc_id", "text", "_y")


def q_domain_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based domain-mixture resampling (XLM-R alpha-
    sampling) at alpha=0 / target 80% of the corpus: the integer
    water-filling level fully keeps every under-represented language
    and downsamples the over-represented one to the level, with rates
    quantized to the 256 md5 buckets. alpha=0 keeps every arithmetic
    step integer-exact, so the oracle re-derives the identical level
    closed-form over the sorted histogram (segment scan instead of the
    operator's binary search — same max level by monotonicity)."""
    from gobulk_spark.operators.quality import temperature_sample

    d = _t(spark, sf_dir, "documents")
    n = d.count()
    out = temperature_sample(d, "doc_id", "lang", target_total=4 * n // 5)
    return out.select("doc_id", "lang")


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup PAIRS (exact jaccard >= 0.5 over 2-gram shingles) folded
    into CLUSTERS via distributed connected components; cluster_id is the
    min doc id (the canonical survivor)."""
    from gobulk_spark.operators.dedup import ngram_jaccard_pairs
    from gobulk_spark.operators.graph import dedup_clusters

    d = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        d, "doc_id", "text", shingle_n=2, min_jaccard=0.5, max_shingle_df=64
    )
    return dedup_clusters(pairs)


def q_dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style target-domain importance weights over the documents
    table (target corpus = source 'src0', raw pool = the rest). Bucket
    contributions are integer micro-units, so the weights are exact
    BIGINT sums — order/partitioning-invariant and SQL-oracle-checkable
    (operators/quality.dsir_importance_weights)."""
    from gobulk_spark.operators.quality import dsir_importance_weights

    d = _t(spark, sf_dir, "documents")
    return dsir_importance_weights(
        d.where(F.col("source") != "src0"),
        d.where(F.col("source") == "src0"),
        "doc_id",
        "text",
    )


def q_near_dup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end near-dup SUPPRESSION composition a training-data
    pipeline actually runs, as one oracle-checked query: candidate
    pairs (exact jaccard >= 0.5 over 2-gram shingles, DF-guarded) →
    connected-components clusters → min-id survivor per cluster →
    anti-join the corpus. Victim ids are the only driver-free state
    (a (long) column, never text)."""
    from gobulk_spark.operators.dedup import ngram_jaccard_pairs
    from gobulk_spark.operators.graph import dedup_clusters

    d = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        d, "doc_id", "text", shingle_n=2, min_jaccard=0.5, max_shingle_df=64
    )
    clusters = dedup_clusters(pairs)
    victims = clusters.where(F.col("doc_id") != F.col("cluster_id")).select(
        "doc_id"
    )
    return d.join(victims, "doc_id", "left_anti").select(
        "doc_id", "lang", "n_chars"
    )


def _winnow_oracle_sql(
    k: int = 16, window: int = 8, min_shared: int = 4, max_fp_df: int = 32
) -> str:
    """DuckDB reproduction of the exact winnowing semantics
    (operators/text.winnow_fingerprints): Karp-Rabin k-gram hashes with
    the uint64-wraparound modulus emulated via HUGEINT (% 2^64) — the
    k-gram polynomial is a FLAT weighted sum with B^j mod 2^64
    coefficients precomputed here (each term < 2^72, the sum < 2^76,
    both inside HUGEINT; a Horner chain would need k CTE passes), the
    murmur-style mixing multiply split into 32-bit halves (a full
    64x64 product overflows signed INT128) — then rightmost-min
    window selection via an exploded-offset equality join (a BETWEEN
    range join is 3.5x slower in DuckDB), and the same distinct /
    document-frequency-guard / min-shared pair semantics as the
    operator.

    ASCII contract (the module-wide oracle portability rule): the
    operator hashes UTF-8 BYTES (numpy uint8) while this SQL hashes
    code points via ascii() — identical only for ASCII text, which the
    driver corpus is (verified at all three scale factors). A non-ASCII
    char would shift every subsequent k-gram on the operator side only;
    if the corpus ever grows non-ASCII text this oracle must switch to
    byte extraction (DuckDB encode()/blob indexing) first."""
    M = 1 << 64
    mix_const = 0xFF51AFD7ED558CCD
    bhi, blo = mix_const >> 32, mix_const & 0xFFFFFFFF
    coef = [pow(1000003, k - 1 - i, M) for i in range(k)]
    terms = " + ".join(
        f"(ascii(substring(lo, p + {i}, 1))::HUGEINT * {c})"
        for i, c in enumerate(coef)
    )
    mix = (
        f"CAST((((acc2::HUGEINT * {blo}) % {M})"
        f" + (((acc2::HUGEINT * {bhi}) % 4294967296) * 4294967296))"
        f" % {M} AS UBIGINT)"
    )
    return f"""WITH kg1 AS (
    SELECT doc_id, p, CAST(({terms}) % {M} AS UBIGINT) AS kr
    FROM (SELECT doc_id, lower(text) AS lo,
                 unnest(range(1, greatest(length(text) - {k - 1}, 0) + 1)) AS p
          FROM documents)),
kg2 AS (SELECT doc_id, p, xor(kr, kr >> 33) AS acc2 FROM kg1),
kg3 AS (SELECT doc_id, p, {mix} AS h2 FROM kg2),
kg AS (SELECT doc_id, p, xor(h2, h2 >> 33) AS h FROM kg3),
ng AS (SELECT doc_id, max(p) AS n FROM kg GROUP BY doc_id),
starts AS (SELECT doc_id, unnest(range(1, greatest(n - {window - 1}, 1) + 1)) AS i
           FROM ng),
offs AS (SELECT unnest(range(0, {window})) AS o),
winmem AS (
    SELECT s.doc_id, s.i, b.p, b.h
    FROM starts s CROSS JOIN offs
    JOIN kg b ON b.doc_id = s.doc_id AND b.p = s.i + offs.o),
winmin AS (SELECT doc_id, i, min(h) AS mh FROM winmem GROUP BY doc_id, i),
picked AS (
    SELECT w.doc_id, max(m.p) AS pos
    FROM winmin w JOIN winmem m
      ON m.doc_id = w.doc_id AND m.i = w.i AND m.h = w.mh
    GROUP BY w.doc_id, w.i),
fps AS (
    SELECT DISTINCT k.doc_id, CAST(k.h >> 1 AS BIGINT) AS fingerprint
    FROM picked p JOIN kg k ON k.doc_id = p.doc_id AND k.p = p.pos),
kept AS (
    SELECT f.* FROM fps f
    JOIN (SELECT fingerprint, count(*) AS df FROM fps GROUP BY fingerprint) d
      ON d.fingerprint = f.fingerprint
    WHERE d.df <= {max_fp_df})
SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared_fingerprints
FROM kept a JOIN kept b ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING count(*) >= {min_shared}"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "quality_rule_filter": q_quality_rule_filter,
        "language_distribution": q_language_distribution,
        "token_stats": q_token_stats,
        "bpe_token_stats": q_bpe_token_stats,
        "fingerprint_dedup": q_fingerprint_dedup,
        "stopword_density": q_stopword_density,
        "max_token_freq": q_max_token_freq,
        "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
        "minhash_signatures": q_minhash_signatures,
        "minhash_lsh_candidates": q_minhash_lsh_candidates,
        "embedding_topk": q_embedding_topk,
        "marker_anti_join": q_marker_anti_join,
        "existence_check_actions": q_existence_check_actions,
        "changed_content_actions": q_changed_content_actions,
        "metrics_rollup": q_metrics_rollup,
        "hourly_event_windows": q_hourly_event_windows,
        "tpch_q1_pricing": q_tpch_q1_pricing,
        "promo_revenue": q_promo_revenue,
        "top_suppliers_per_nation": q_top_suppliers_per_nation,
        "dedup_survivors": q_dedup_survivors,
        "sessionization": q_sessionization,
        "pricing_rollup": q_pricing_rollup,
        "event_type_pivot": q_event_type_pivot,
        "value_quantiles": q_value_quantiles,
        "tfidf_top_terms": q_tfidf_top_terms,
        "asof_join_variants": q_asof_join_variants,
        "txlog_pruned_rollup": q_txlog_pruned_rollup,
        "txlog_change_feed_rollup": q_txlog_change_feed_rollup,
        "salted_join_revenue": q_salted_join_revenue,
        "embedding_exact_near_dups": q_embedding_exact_near_dups,
        # round-5 fusion: both per-doc stat frames in one entry (doc_id
        # join) — frees a slot for the Lee-style span detector below
        "per_doc_curation_stats": q_per_doc_curation_stats,
        # exact duplicate-substring spans (Lee et al. 2021)
        "duplicate_token_spans": q_duplicate_token_spans,
        "segment_dedup_rewrite": q_segment_dedup_rewrite,
        "sequence_packing": q_sequence_packing,
        "contamination_check": q_contamination_check,
        # round-5 fusion: both samplers in one entry (standalone tests
        # + bench legs remain) — frees a slot for the NB classifier
        "deterministic_samplers": q_deterministic_samplers,
        "dedup_clusters": q_dedup_clusters,
        "near_dup_survivors": q_near_dup_survivors,
        "dsir_importance_weights": q_dsir_importance_weights,
        # oracle-checked since round 3: the md5-vote simhash is exactly
        # reproducible in SQL, and multi-probe banding is recall-1.0 by
        # pigeonhole (guard never trips on this corpus), so the banded
        # result equals the exact all-pairs scan bit-for-bit
        "simhash_near_dups": q_simhash_near_dups,
        # oracle-checked since round 3: Karp-Rabin mod-2^64 emulated in
        # DuckDB via HUGEINT — see _winnow_oracle_sql
        "winnow_overlap_pairs": q_winnow_overlap_pairs,
        # ALL six ANN recall floors fused into ONE oracle-checked entry
        # (round-5: six separate entries straddled the driver's
        # 50-query cap and four were never driver-run)
        "ann_recall_gates": q_ann_recall_gates,
        # at-rest partition-pruned ANN stores: pruned query == in-memory
        # operator, probe predicate in PartitionFilters
        "ann_store_gates": q_ann_store_gates,
        # flagship keep/drop F1 + scrub exact-match vs the reference
        # labeler, measured in-engine against a literal oracle
        "flagship_f1_gate": q_flagship_f1_gate,
        # image near-dup pairs by phash banding vs the DuckDB all-pairs
        # hamming scan over the same corpus parquet
        "phash_near_dup_images": q_phash_near_dup_images,
        # temperature-based domain-mixture resampling (XLM-R alpha-
        # sampling): integer water-filling level, md5-bucket-quantized
        # rates, exact closed-form re-derivation in the oracle
        "domain_mixture_sample": q_domain_mixture_sample,
        # seed-labeled NB classifier distillation, exact to the integer
        "nb_quality_classifier": q_nb_quality_classifier,
        # rows-only tail (vectorized Arrow UDF / seeded-RNG operators) —
        # MUST stay last: everything above is oracle-checked and the
        # driver records exactly the first 50 entries
        "flagship_quality_filter": q_flagship_quality_filter,
        "embedding_ann_families": q_embedding_ann_families,
        "embedding_near_dup_families": q_embedding_near_dup_families,
    }


def oracle_sql() -> dict[str, str]:
    # ' +' regex split matches gobulk_spark.operators.text.tokens() (and
    # the rest of this file) on documents with consecutive spaces
    shingle_cte = """
    toks AS (
        SELECT doc_id,
               unnest(string_split_regex(trim(text), ' +')) AS tok,
               unnest(range(1, len(string_split_regex(trim(text), ' +')) + 1)) AS pos
        FROM documents
    ),
    sh AS (
        SELECT DISTINCT t1.doc_id, t1.tok || ' ' || t2.tok AS shingle
        FROM toks t1
        JOIN toks t2 ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
    )
    """
    return {
        "quality_rule_filter": """
            SELECT doc_id,
                   CASE WHEN length(text) < 80 THEN 'too_short'
                        WHEN length(text) > 380 THEN 'too_long'
                        WHEN len(string_split_regex(trim(text), ' +')) < 15 THEN 'too_few_tokens'
                   END AS drop_reason,
                   (CASE WHEN length(text) < 80 THEN 'too_short'
                         WHEN length(text) > 380 THEN 'too_long'
                         WHEN len(string_split_regex(trim(text), ' +')) < 15 THEN 'too_few_tokens'
                    END) IS NULL AS keep
            FROM documents
        """,
        "language_distribution": """
            SELECT lang, count(*) AS n_docs,
                   round(avg(length(text)), 4) AS avg_chars
            FROM documents GROUP BY lang
        """,
        "token_stats": """
            SELECT doc_id,
                   CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS n_tokens,
                   CAST(len(list_distinct(string_split_regex(trim(text), ' +'))) AS BIGINT) AS n_distinct_tokens
            FROM documents
        """,
        "bpe_token_stats": """
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text,
                        ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+|\\s+')) AS BIGINT)
                        AS n_bpe_pieces,
                   CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS n_ws_tokens
            FROM documents
        """,
        "fingerprint_dedup": """
            SELECT source, count(*) AS n_docs,
                   count(DISTINCT md5(lower(trim(text)))) AS n_unique_fp
            FROM documents GROUP BY source
        """,
        "stopword_density": """
            SELECT doc_id,
                   len(list_filter(string_split_regex(trim(text), ' +'),
                                   x -> x IN ('the', 'a')))
                   / greatest(len(string_split_regex(trim(text), ' +')), 1)
                   AS stopword_density
            FROM documents
        """,
        "max_token_freq": """
            WITH toks AS (
                SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS tok
                FROM documents
            ), tf AS (
                SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok
            )
            SELECT doc_id, max(c) / sum(c) AS max_token_freq_ratio,
                   CAST(sum(c) AS BIGINT) AS n_tokens
            FROM tf GROUP BY doc_id
        """,
        "ngram_jaccard_pairs": f"""
            WITH {shingle_cte},
            shc AS (  -- stop-shingle cap: drop shingles in > 64 docs
                SELECT sh.doc_id, sh.shingle FROM sh
                JOIN (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle) d
                  ON d.shingle = sh.shingle
                WHERE d.df <= 64
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY doc_id),
            inter AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
                FROM shc a JOIN shc b
                  ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                GROUP BY a.doc_id, b.doc_id
            )
            SELECT id_a, id_b, n_common,
                   round(n_common / (sa.n + sb.n - n_common), 6) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE n_common / (sa.n + sb.n - n_common) >= 0.08
        """,
        "minhash_signatures": f"""
            WITH {shingle_cte}
            SELECT sh.doc_id, band.band AS band,
                   min(md5(CAST(band.band AS VARCHAR) || '|' || sh.shingle)) AS minhash
            FROM sh CROSS JOIN (SELECT unnest(range(0, 8)) AS band) band
            GROUP BY sh.doc_id, band.band
        """,
        "minhash_lsh_candidates": f"""
            WITH {shingle_cte},
            sig0 AS (
                SELECT sh.doc_id, band.band AS band,
                       min(md5(CAST(band.band AS VARCHAR) || '|' || sh.shingle)) AS minhash
                FROM sh CROSS JOIN (SELECT unnest(range(0, 8)) AS band) band
                GROUP BY sh.doc_id, band.band
            ),
            sig AS (  -- hot-bucket guard: drop buckets with > 64 members
                SELECT s.* FROM sig0 s
                JOIN (SELECT band, minhash, count(*) AS bs
                      FROM sig0 GROUP BY band, minhash) b
                  ON b.band = s.band AND b.minhash = s.minhash
                WHERE b.bs <= 64
            )
            SELECT l.doc_id AS id_a, r.doc_id AS id_b, count(*) AS bands_agreeing
            FROM sig l JOIN sig r
              ON l.band = r.band AND l.minhash = r.minhash AND l.doc_id < r.doc_id
            GROUP BY l.doc_id, r.doc_id
        """,
        "embedding_topk": """
            SELECT e.vec_id,
                   round(list_cosine_similarity(e.embedding::DOUBLE[],
                                                q.embedding::DOUBLE[]), 6) AS cosine
            FROM embeddings e,
                 (SELECT embedding FROM embeddings WHERE vec_id = 0) q
            WHERE e.vec_id != 0
            ORDER BY list_cosine_similarity(e.embedding::DOUBLE[],
                                            q.embedding::DOUBLE[]) DESC, e.vec_id
            LIMIT 10
        """,
        "marker_anti_join": """
            SELECT o_orderpriority, count(*) AS n_orders
            FROM orders
            WHERE o_custkey NOT IN (
                SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
            GROUP BY o_orderpriority
        """,
        "existence_check_actions": """
            SELECT CASE WHEN EXISTS (
                       SELECT 1 FROM customer c
                       WHERE c.c_custkey = o.o_custkey AND c.c_acctbal > 5000)
                   THEN 'update' ELSE 'create' END AS action,
                   count(*) AS n_ops,
                   round(sum(o_totalprice), 2) AS total
            FROM orders o GROUP BY 1
        """,
        "changed_content_actions": """
            WITH inc AS (
                SELECT doc_id, md5(lower(trim(text))) AS content_hash,
                       (length(text) >= 80 AND length(text) <= 380
                        AND len(string_split_regex(trim(text), ' +')) >= 15) AS keep
                FROM documents
            ), store AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 6 = 0 THEN md5(text || '|v0')
                            ELSE md5(lower(trim(text))) END AS stored_hash
                FROM documents WHERE doc_id % 3 = 0
            )
            SELECT CASE WHEN s.stored_hash IS NULL AND inc.keep THEN 'create'
                        WHEN s.stored_hash IS NULL THEN 'omit'
                        WHEN s.stored_hash = inc.content_hash THEN 'skip'
                        WHEN inc.keep THEN 'update' ELSE 'delete' END AS action,
                   count(*) AS n_ops
            FROM inc LEFT JOIN store s USING (doc_id)
            GROUP BY 1
        """,
        "metrics_rollup": """
            SELECT event_type, count(*) AS n_events,
                   round(sum(value), 4) AS sum_value,
                   round(min(value), 6) AS min_value,
                   round(max(value), 6) AS max_value
            FROM events GROUP BY event_type
        """,
        "hourly_event_windows": """
            SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS hour_epoch,
                   event_type, count(*) AS n_events
            FROM events GROUP BY 1, 2
        """,
        "tpch_q1_pricing": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "promo_revenue": """
            SELECT CAST(year(l_shipdate) AS INTEGER) AS ship_year,
                   round(sum(CASE WHEN p_type LIKE 'PROMO%'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0.0 END) * 100.0
                         / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_pct,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY 1
        """,
        "top_suppliers_per_nation": """
            SELECT n_name, s_name, round(s_acctbal, 2) AS acctbal, rk
            FROM (
                SELECT n.n_name, s.s_name, s.s_acctbal,
                       row_number() OVER (PARTITION BY n.n_name
                                          ORDER BY s.s_acctbal DESC, s.s_name ASC) AS rk
                FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
            ) WHERE rk <= 3
        """,
        "dedup_survivors": """
            SELECT d.doc_id, d.source
            FROM documents d
            JOIN (SELECT md5(lower(trim(text))) AS fp, min(doc_id) AS doc_id
                  FROM documents GROUP BY 1) s
              ON s.doc_id = d.doc_id
        """,
        "sessionization": """
            WITH g AS (
                SELECT user_id,
                       epoch(ts) - lag(epoch(ts)) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id) AS gap
                FROM events
            )
            SELECT user_id,
                   CAST(sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_sessions,
                   count(*) AS n_events
            FROM g GROUP BY user_id
        """,
        "pricing_rollup": """
            SELECT l_returnflag, l_linestatus, count(*) AS n_items,
                   round(sum(l_extendedprice), 2) AS sum_price
            FROM lineitem
            GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """,
        "event_type_pivot": """
            SELECT CAST(hour(ts) AS INTEGER) AS hour_of_day,
                   CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
                   CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
                   CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
                   CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
                   CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
            FROM events GROUP BY 1
        """,
        "salted_join_revenue": """
            SELECT c_mktsegment, count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS revenue
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY 1
        """,
        "tfidf_top_terms": """
            WITH toks AS (
                SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS token
                FROM documents
            ), tf AS (
                SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2
            ), docfreq AS (
                SELECT token, count(*) AS df FROM tf GROUP BY 1
            ), total AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
            scored AS (
                SELECT tf.doc_id, tf.token, tf.tf * ln(CAST(total.n AS DOUBLE) / docfreq.df) AS tfidf
                FROM tf JOIN docfreq USING (token) CROSS JOIN total
            )
            SELECT doc_id, token, CAST(rk AS INTEGER) AS rk, round(tfidf, 6) AS tfidf
            FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY doc_id ORDER BY tfidf DESC, token ASC) AS rk
                FROM scored
            ) WHERE rk <= 3
        """,
        # one ASOF result cross-joined with the three implementation
        # labels: every variant (plain / salted / auto) must match the
        # oracle row-for-row — fused so all three fit one 50-cap slot
        "asof_join_variants": """
            WITH purchases AS (
                SELECT event_id, user_id, ts FROM events
                WHERE event_type = 'purchase'
            ), views AS (
                SELECT user_id, ts, max(event_id) AS event_id FROM events
                WHERE event_type = 'view' GROUP BY user_id, ts
            ), base AS (
                SELECT p.event_id, p.user_id,
                       -- floor, not CAST-rounding: Spark ts->long truncates
                       CAST(floor(epoch(p.ts)) AS BIGINT) AS purchase_epoch,
                       v.event_id AS view_event_id,
                       CAST(floor(epoch(p.ts)) - floor(epoch(v.ts)) AS BIGINT) AS gap_s
                FROM purchases p ASOF LEFT JOIN views v
                  ON p.user_id = v.user_id AND p.ts >= v.ts
            )
            SELECT base.*, variants.variant
            FROM base CROSS JOIN (
                VALUES ('plain'), ('salted'), ('auto')
            ) AS variants(variant)
        """,
        # independent oracle over the ORIGINAL parquet for the txlog
        # round-trip: surviving rows = everything except the MERGE-
        # deleted error events under 5.00; cents as BIGINT keeps both
        # engines in exact integer arithmetic
        "txlog_pruned_rollup": """
            WITH surv AS (
                SELECT event_id, user_id, event_type,
                       CAST(round(value * 100) AS BIGINT) AS cents
                FROM events
                WHERE NOT (event_type = 'error'
                           AND CAST(round(value * 100) AS BIGINT) < 500)
            ), merged AS (
                SELECT CAST(event_id AS VARCHAR) AS image_id, user_id,
                       event_type,
                       CASE WHEN event_type = 'purchase' AND user_id < 20
                            THEN cents * 2 ELSE cents END AS cents
                FROM surv
                UNION ALL SELECT 'syn-1', 15, 'purchase', 111
                UNION ALL SELECT 'syn-2', 25, 'signup', 222
            ), final AS (
                -- DELETE WHERE user_id >= 120 (no-op at sf0.001)
                SELECT * FROM merged WHERE user_id < 120
            )
            SELECT event_type, COUNT(*) AS n_events,
                   CAST(SUM(cents) AS BIGINT) AS sum_cents
            FROM final
            WHERE user_id >= 10 AND user_id < 40
            GROUP BY event_type
            UNION ALL
            SELECT '__point__', COUNT(*), CAST(SUM(cents) AS BIGINT)
            FROM final
            WHERE image_id = (SELECT CAST(max(event_id) AS VARCHAR)
                              FROM surv WHERE user_id < 120)
        """,
        "txlog_change_feed_rollup": """
            SELECT event_type, COUNT(*) AS n
            FROM (
                SELECT event_type
                FROM events
                WHERE NOT (event_type = 'error'
                           AND CAST(round(value * 100) AS BIGINT) < 500)
                  AND user_id < 120  -- DELETE WHERE fold
                UNION ALL SELECT 'purchase'
                UNION ALL SELECT 'signup'
            )
            GROUP BY event_type
        """,
        # constant-row oracles for the invariant gates: the VALUES are
        # fixed by design (labels, floors, ok=true); only an engine
        # regression can break the hash
        "ann_recall_gates": """
            SELECT 'lsh_ann_bucket_topk' AS family,
                   CAST(1.0 AS DOUBLE) AS recall_floor, TRUE AS recall_ok
            UNION ALL SELECT 'ivf_ann_probe4', CAST(0.45 AS DOUBLE), TRUE
            UNION ALL SELECT 'ivf_ann_probe_all', CAST(1.0 AS DOUBLE), TRUE
            UNION ALL SELECT 'pq_ann', CAST(0.9 AS DOUBLE), TRUE
            UNION ALL SELECT 'ivfpq_ann_probe4', CAST(0.45 AS DOUBLE), TRUE
            UNION ALL SELECT 'banded_near_dups', CAST(0.9 AS DOUBLE), TRUE
            UNION ALL SELECT 'ivf_near_dups', CAST(0.85 AS DOUBLE), TRUE
        """,
        "ann_store_gates": """
            SELECT 'ivf_store_equals_memory' AS gate, TRUE AS ok
            UNION ALL SELECT 'ivf_store_partition_pruned', TRUE
            UNION ALL SELECT 'ivf_append_self_retrieval', TRUE
            UNION ALL SELECT 'lsh_store_equals_memory', TRUE
            UNION ALL SELECT 'lsh_store_partition_pruned', TRUE
        """,
        "flagship_f1_gate": """
            SELECT 'keep_drop_f1' AS metric,
                   CAST(0.99 AS DOUBLE) AS floor, TRUE AS ok
            UNION ALL SELECT 'scrub_exact_match', CAST(1.0 AS DOUBLE), TRUE
        """,
        # real (non-literal) oracle over the SAME corpus parquet the
        # Spark query writes/ensures first: exact all-pairs 64-bit
        # hamming at the radius — the banded operator with the guard
        # off is recall-1.0 by pigeonhole, so equality is bit-for-bit
        "phash_near_dup_images": """
            WITH p AS (
                SELECT image_id, phash FROM read_parquet(
                    '/tmp/gobulk_spark_test_corpora/n1500/pairs.parquet')
            )
            SELECT a.image_id AS id_a, b.image_id AS id_b,
                   CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
            FROM p a JOIN p b ON a.image_id < b.image_id
            WHERE bit_count(xor(a.phash, b.phash)) <= 4
        """,
        "value_quantiles": """
            SELECT event_type,
                   round(quantile_cont(value, 0.5), 6) AS p50,
                   round(quantile_cont(value, 0.9), 6) AS p90
            FROM events GROUP BY event_type
        """,
        "embedding_exact_near_dups": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(a.embedding::DOUBLE[],
                                                b.embedding::DOUBLE[]), 6) AS cosine
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding::DOUBLE[],
                                         b.embedding::DOUBLE[]) >= 0.4
        """,
        "per_doc_curation_stats": """
            SELECT r.doc_id, r.top_2gram_frac, r.dup_3gram_frac,
                   g.n_segments, g.n_shared_segments, g.shared_frac
            FROM (
            WITH toks AS (
                SELECT doc_id,
                       unnest(string_split_regex(trim(text), ' +')) AS tok,
                       unnest(range(1, len(string_split_regex(trim(text), ' +')) + 1)) AS pos
                FROM documents
            ),
            g2 AS (
                SELECT t1.doc_id, t1.tok || ' ' || t2.tok AS g
                FROM toks t1
                JOIN toks t2 ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
            ),
            g3 AS (
                SELECT t1.doc_id, t1.tok || ' ' || t2.tok || ' ' || t3.tok AS g
                FROM toks t1
                JOIN toks t2 ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
                JOIN toks t3 ON t1.doc_id = t3.doc_id AND t3.pos = t1.pos + 2
            ),
            top2 AS (
                SELECT doc_id, round(max(c) / sum(c), 6) AS top_2gram_frac
                FROM (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY doc_id, g)
                GROUP BY doc_id
            ),
            d3 AS (
                SELECT doc_id,
                       round((count(*) - count(DISTINCT g)) / count(*), 6)
                           AS dup_3gram_frac
                FROM g3 GROUP BY doc_id
            )
            SELECT d.doc_id,
                   coalesce(top_2gram_frac, 0.0) AS top_2gram_frac,
                   coalesce(dup_3gram_frac, 0.0) AS dup_3gram_frac
            FROM documents d
            LEFT JOIN top2 USING (doc_id) LEFT JOIN d3 USING (doc_id)
            ) r
            JOIN (
            WITH toks AS (
                SELECT doc_id,
                       unnest(string_split_regex(trim(text), ' +')) AS tok,
                       unnest(range(1, len(string_split_regex(trim(text), ' +')) + 1)) AS pos
                FROM documents
            ),
            segs AS (
                SELECT doc_id, (pos - 1) // 8 AS seg_id,
                       md5(string_agg(tok, ' ' ORDER BY pos)) AS seg_hash
                FROM toks GROUP BY doc_id, (pos - 1) // 8
            ),
            dfreq AS (SELECT seg_hash, count(DISTINCT doc_id) AS ndocs
                      FROM segs GROUP BY seg_hash)
            SELECT s.doc_id,
                   CAST(count(*) AS BIGINT) AS n_segments,
                   CAST(sum(CASE WHEN dfreq.ndocs > 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_shared_segments,
                   round(sum(CASE WHEN dfreq.ndocs > 1 THEN 1 ELSE 0 END) / count(*), 6)
                       AS shared_frac
            FROM segs s JOIN dfreq USING (seg_hash)
            GROUP BY s.doc_id
            ) g USING (doc_id)
        """,
        # Lee et al. exact duplicate-substring spans: stride-1 8-token
        # window hashes, cross-doc duplicated windows, gaps-and-islands
        # merge — positions 1-based inclusive, spans maximal
        "duplicate_token_spans": """
            WITH dt AS (
                SELECT doc_id, string_split_regex(trim(text), ' +') AS toks
                FROM documents
            ),
            win AS (
                SELECT doc_id, i AS pos,
                       md5(array_to_string(toks[i:i+7], ' ')) AS h
                FROM dt, unnest(range(1, len(toks) - 6)) AS t(i)
                WHERE len(toks) >= 8
            ),
            dup AS (SELECT h FROM win GROUP BY h
                    HAVING count(DISTINCT doc_id) > 1),
            dw AS (SELECT w.doc_id, w.pos FROM win w JOIN dup USING (h)),
            isl AS (
                SELECT doc_id, pos,
                       pos - ROW_NUMBER() OVER (PARTITION BY doc_id
                                                ORDER BY pos) AS g
                FROM dw
            )
            SELECT doc_id,
                   CAST(MIN(pos) AS INT) AS span_start,
                   CAST(MAX(pos) + 7 AS INT) AS span_end,
                   CAST(MAX(pos) + 8 - MIN(pos) AS BIGINT) AS span_tokens
            FROM isl GROUP BY doc_id, g
        """,
        
        "segment_dedup_rewrite": """
            WITH toks AS (
                SELECT doc_id,
                       unnest(string_split_regex(trim(text), ' +')) AS tok,
                       unnest(range(1, len(string_split_regex(trim(text), ' +')) + 1)) AS pos
                FROM documents
            ),
            segs AS (
                SELECT doc_id, (pos - 1) // 8 AS seg_id,
                       string_agg(tok, ' ' ORDER BY pos) AS seg_text,
                       md5(string_agg(tok, ' ' ORDER BY pos)) AS seg_hash
                FROM toks GROUP BY doc_id, (pos - 1) // 8
            ),
            dfreq AS (SELECT seg_hash, count(DISTINCT doc_id) AS ndocs
                      FROM segs GROUP BY seg_hash),
            marked AS (
                SELECT s.doc_id, s.seg_id, s.seg_text, d.ndocs > 1 AS is_hot
                FROM segs s JOIN dfreq d USING (seg_hash)
            )
            SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS n_segments,
                   CAST(sum(CASE WHEN is_hot THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_removed,
                   coalesce(string_agg(CASE WHEN NOT is_hot THEN seg_text END,
                                       ' ' ORDER BY seg_id), '') AS clean_text
            FROM marked GROUP BY doc_id
        """,
        "sequence_packing": """
            WITH t AS (
                SELECT doc_id,
                       CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT)
                           AS n_tokens,
                       md5(CAST(doc_id AS VARCHAR)) AS h
                FROM documents
            ),
            c AS (
                SELECT doc_id, n_tokens,
                       sum(n_tokens) OVER (
                           ORDER BY h, doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                       ) AS cum
                FROM t
            )
            SELECT doc_id, n_tokens,
                   CAST(floor((cum - n_tokens) / 512.0) AS BIGINT) AS seq_id
            FROM c
        """,
        "contamination_check": """
            WITH toks AS (
                SELECT doc_id,
                       unnest(string_split_regex(trim(text), ' +')) AS tok,
                       unnest(range(1, len(string_split_regex(trim(text), ' +')) + 1)) AS pos
                FROM documents
            ),
            sh AS (
                SELECT DISTINCT t1.doc_id,
                       t1.tok || ' ' || t2.tok || ' ' || t3.tok || ' ' ||
                       t4.tok || ' ' || t5.tok AS g
                FROM toks t1
                JOIN toks t2 ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
                JOIN toks t3 ON t1.doc_id = t3.doc_id AND t3.pos = t1.pos + 2
                JOIN toks t4 ON t1.doc_id = t4.doc_id AND t4.pos = t1.pos + 3
                JOIN toks t5 ON t1.doc_id = t5.doc_id AND t5.pos = t1.pos + 4
            ),
            ev AS (SELECT DISTINCT g, doc_id AS eval_id FROM sh WHERE doc_id % 29 = 0),
            tr AS (SELECT * FROM sh WHERE doc_id % 29 != 0)
            SELECT tr.doc_id,
                   CAST(count(DISTINCT tr.g) AS BIGINT) AS n_hit_ngrams,
                   CAST(count(DISTINCT ev.eval_id) AS BIGINT) AS n_eval_docs
            FROM tr JOIN ev ON tr.g = ev.g GROUP BY tr.doc_id
        """,
        "deterministic_samplers": """
            SELECT 'hash_split' AS family, doc_id,
                   CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                        THEN 'train'
                        WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'f3'
                        THEN 'val'
                        ELSE 'test' END AS tag
            FROM documents
            UNION ALL
            SELECT 'stratified', doc_id, lang FROM documents
            WHERE substring(md5(CAST(doc_id AS VARCHAR) || '|' || lang), 1, 2) <
                  CASE lang WHEN 'en' THEN '80' WHEN 'de' THEN '40' ELSE '19' END
        """,
        # NB classifier, exact: per-bucket class counts over the
        # doc_id%3=0 seed, Laplace LLRs rounded to BIGINT micro-units
        # BEFORE summation (the DSIR discipline), smoothed doc prior,
        # unseen buckets take the shared smoothed default
        "nb_quality_classifier": """
            WITH toks AS (
                SELECT doc_id, lang,
                       substr(md5(unnest(string_split_regex(trim(text), ' +'))), 1, 2) AS b
                FROM documents
            ),
            cnt AS (
                SELECT b,
                       SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct1,
                       SUM(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS ct0
                FROM toks WHERE doc_id % 3 = 0 GROUP BY b
            ),
            tot AS (SELECT CAST(SUM(ct1) AS BIGINT) AS n1,
                           CAST(SUM(ct0) AS BIGINT) AS n0 FROM cnt),
            llr AS (
                SELECT b, CAST(round((
                           ln((ct1 + 1.0) / (n1 + 256.0))
                         - ln((ct0 + 1.0) / (n0 + 256.0))) * 1000000, 0)
                       AS BIGINT) AS w
                FROM cnt, tot
            ),
            dflt AS (
                SELECT CAST(round((
                           ln(1.0 / (n1 + 256.0))
                         - ln(1.0 / (n0 + 256.0))) * 1000000, 0)
                       AS BIGINT) AS w FROM tot
            ),
            prior AS (
                SELECT CAST(round((
                           ln((SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) + 1.0)
                              / (COUNT(*) + 2.0))
                         - ln((SUM(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) + 1.0)
                              / (COUNT(*) + 2.0))) * 1000000, 0)
                       AS BIGINT) AS p
                FROM documents WHERE doc_id % 3 = 0
            ),
            perdoc AS (
                SELECT doc_id, b, COUNT(*) AS n_db FROM toks
                WHERE doc_id % 3 <> 0 GROUP BY doc_id, b
            ),
            scored AS (
                SELECT p.doc_id,
                       CAST(SUM(n_db) AS BIGINT) AS n_tokens,
                       CAST(SUM(n_db * COALESCE(llr.w, dflt.w))
                            + ANY_VALUE(prior.p) AS BIGINT) AS score_micro
                FROM perdoc p
                LEFT JOIN llr ON llr.b = p.b, dflt, prior
                GROUP BY p.doc_id
            )
            SELECT doc_id, n_tokens, score_micro,
                   score_micro > 0 AS keep
            FROM scored
        """,
        # temperature_sample at alpha=0: the operator's binary-searched
        # water-filling level re-derived closed-form — sorted histogram,
        # one level candidate per segment (rn-1 domains fully kept),
        # c_k = (T - prefix) // (L - (rn-1)) clamped into [prev_n, n-1];
        # the max valid candidate IS the operator's max level because
        # kept(c) is monotone. Rates quantized to 256 md5 buckets; the
        # bucket is the md5 prefix pair decoded by hex-digit position
        # (Spark side uses conv(,16,10) — same integer).
        "domain_mixture_sample": """
            WITH counts AS (
                SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
            ), tgt AS (
                SELECT CAST(SUM(n) AS BIGINT) AS big_n, COUNT(*) AS l,
                       CAST(SUM(n) * 4 // 5 AS BIGINT) AS t
                FROM counts
            ), ord AS (
                SELECT lang, n,
                       ROW_NUMBER() OVER (ORDER BY n, lang) AS rn,
                       SUM(n) OVER (ORDER BY n, lang
                                    ROWS UNBOUNDED PRECEDING) - n AS s_prev,
                       COALESCE(LAG(n) OVER (ORDER BY n, lang), 0) AS prev_n
                FROM counts
            ), segs AS (
                SELECT (t.t - o.s_prev) // (t.l - (o.rn - 1)) AS c_k,
                       o.prev_n, o.n
                FROM ord o, tgt t
            ), level AS (
                SELECT MAX(LEAST(c_k, n - 1)) AS c
                FROM segs WHERE c_k >= prev_n
            ), thr AS (
                SELECT c2.lang,
                       CASE WHEN t.t >= t.big_n THEN CAST(256 AS BIGINT)
                            ELSE 256 * LEAST(c2.n, l2.c) // c2.n END AS t_l
                FROM counts c2, level l2, tgt t
            )
            SELECT d.doc_id, d.lang
            FROM documents d JOIN thr ON d.lang = thr.lang
            WHERE (strpos('0123456789abcdef', substring(
                       md5(CAST(d.doc_id AS VARCHAR) || '|' || d.lang),
                       1, 1)) - 1) * 16
                + (strpos('0123456789abcdef', substring(
                       md5(CAST(d.doc_id AS VARCHAR) || '|' || d.lang),
                       2, 1)) - 1)
                < thr.t_l
        """,
        # exact semantics of the operator contract: 64-bit simhash =
        # per-token md5 (first 8 bytes, big-endian) majority vote over
        # token OCCURRENCES (ties -> 0), two's-complement packing with
        # bit 0 as the sign bit; pairs = all-pairs hamming <= 16. The
        # engine's multi-probe banding is recall-1.0 at the radius by
        # generalized pigeonhole and its auto guard only drops buckets
        # 8x above uniform (none on this corpus), so banded == exact.
        "simhash_near_dups": """
            WITH toks AS (
                SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS tok
                FROM documents
            ),
            th AS (SELECT doc_id, substring(md5(tok), 1, 16) AS h FROM toks),
            bits AS (
                SELECT doc_id, j.j,
                       ((strpos('0123456789abcdef',
                                substring(th.h, CAST(j.j // 4 AS INTEGER) + 1, 1)) - 1)
                        >> CAST(3 - (j.j % 4) AS INTEGER)) & 1 AS bit
                FROM th CROSS JOIN (SELECT unnest(range(0, 64)) AS j) j
            ),
            votes AS (
                SELECT doc_id, j, sum(CASE WHEN bit = 1 THEN 1 ELSE -1 END) AS v
                FROM bits GROUP BY doc_id, j
            ),
            sig AS (
                SELECT doc_id,
                       CAST(sum(CASE WHEN v > 0 AND j > 0
                                THEN (CAST(1 AS BIGINT) << CAST(63 - j AS INTEGER))
                                ELSE 0 END) AS BIGINT)
                       + CAST(sum(CASE WHEN v > 0 AND j = 0 THEN 1 ELSE 0 END) AS BIGINT)
                         * (-9223372036854775807 - 1) AS simhash
                FROM votes GROUP BY doc_id
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
            FROM sig a JOIN sig b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 16
        """,
        "dedup_clusters": """
            WITH RECURSIVE toks AS (
                SELECT doc_id,
                       unnest(string_split_regex(trim(text), ' +')) AS tok,
                       unnest(range(1, len(string_split_regex(trim(text), ' +')) + 1)) AS pos
                FROM documents
            ),
            sh AS (
                SELECT DISTINCT t1.doc_id, t1.tok || ' ' || t2.tok AS shingle
                FROM toks t1
                JOIN toks t2 ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
            ),
            shc AS (
                SELECT sh.doc_id, sh.shingle FROM sh
                JOIN (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle) d
                  ON d.shingle = sh.shingle
                WHERE d.df <= 64
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY doc_id),
            inter AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
                FROM shc a JOIN shc b
                  ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                GROUP BY a.doc_id, b.doc_id
            ),
            edges AS (
                SELECT id_a, id_b FROM inter
                JOIN sizes sa ON sa.doc_id = id_a
                JOIN sizes sb ON sb.doc_id = id_b
                WHERE n_common / (sa.n + sb.n - n_common) >= 0.5
            ),
            ed2 AS (SELECT id_a AS a, id_b AS b FROM edges
                    UNION ALL SELECT id_b, id_a FROM edges),
            nodes AS (SELECT DISTINCT a AS node FROM ed2),
            reach AS (
                SELECT node, node AS lbl FROM nodes
                UNION
                SELECT e.b AS node, r.lbl FROM reach r JOIN ed2 e ON e.a = r.node
                WHERE r.lbl < e.b
            ),
            cc AS (SELECT node AS doc_id, min(lbl) AS cluster_id
                   FROM reach GROUP BY node),
            sz AS (SELECT cluster_id, count(*) AS cluster_size
                   FROM cc GROUP BY cluster_id)
            SELECT CAST(cc.doc_id AS BIGINT) AS doc_id,
                   CAST(cc.cluster_id AS BIGINT) AS cluster_id,
                   CAST(sz.cluster_size AS BIGINT) AS cluster_size
            FROM cc JOIN sz USING (cluster_id)
        """,
        # weights are exact integer sums of per-bucket micro-unit
        # contributions; ln() is the only float op and it is rounded to
        # 1e-6 BEFORE any summation on both engines
        "dsir_importance_weights": """
            WITH toks AS (
                SELECT doc_id, source,
                       unnest(string_split_regex(trim(text), ' +')) AS tok,
                       unnest(range(1, len(string_split_regex(trim(text), ' +')) + 1)) AS pos
                FROM documents
            ),
            grams AS (
                SELECT t1.doc_id, t1.source,
                       substr(md5(t1.tok || ' ' || t2.tok), 1, 2) AS b
                FROM toks t1
                JOIN toks t2 ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
            ),
            tb AS (SELECT b, count(*) AS ct_t FROM grams
                   WHERE source = 'src0' GROUP BY b),
            rb AS (SELECT b, count(*) AS ct_r FROM grams
                   WHERE source <> 'src0' GROUP BY b),
            tot AS (SELECT
                (SELECT count(*) FROM grams WHERE source = 'src0') AS n_t,
                (SELECT count(*) FROM grams WHERE source <> 'src0') AS n_r),
            contrib AS (
                SELECT coalesce(tb.b, rb.b) AS b,
                       CAST(round((
                           ln((coalesce(ct_t, 0) + 1.0) / (n_t + 256.0))
                         - ln((coalesce(ct_r, 0) + 1.0) / (n_r + 256.0))
                       ) * 1000000, 0) AS BIGINT) AS contrib
                FROM tb FULL JOIN rb ON tb.b = rb.b, tot
            ),
            perdoc AS (SELECT doc_id, b, count(*) AS n_db FROM grams
                       WHERE source <> 'src0' GROUP BY doc_id, b)
            SELECT p.doc_id,
                   CAST(sum(n_db) AS BIGINT) AS n_grams,
                   CAST(sum(n_db * contrib) AS BIGINT) AS weight_micro
            FROM perdoc p JOIN contrib USING (b)
            GROUP BY p.doc_id
        """,
        # same candidate/cluster CTE chain as dedup_clusters, final
        # select inverted: the corpus minus non-canonical cluster members
        "near_dup_survivors": """
            WITH RECURSIVE toks AS (
                SELECT doc_id,
                       unnest(string_split_regex(trim(text), ' +')) AS tok,
                       unnest(range(1, len(string_split_regex(trim(text), ' +')) + 1)) AS pos
                FROM documents
            ),
            sh AS (
                SELECT DISTINCT t1.doc_id, t1.tok || ' ' || t2.tok AS shingle
                FROM toks t1
                JOIN toks t2 ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
            ),
            shc AS (
                SELECT sh.doc_id, sh.shingle FROM sh
                JOIN (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle) d
                  ON d.shingle = sh.shingle
                WHERE d.df <= 64
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY doc_id),
            inter AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
                FROM shc a JOIN shc b
                  ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                GROUP BY a.doc_id, b.doc_id
            ),
            edges AS (
                SELECT id_a, id_b FROM inter
                JOIN sizes sa ON sa.doc_id = id_a
                JOIN sizes sb ON sb.doc_id = id_b
                WHERE n_common / (sa.n + sb.n - n_common) >= 0.5
            ),
            ed2 AS (SELECT id_a AS a, id_b AS b FROM edges
                    UNION ALL SELECT id_b, id_a FROM edges),
            nodes AS (SELECT DISTINCT a AS node FROM ed2),
            reach AS (
                SELECT node, node AS lbl FROM nodes
                UNION
                SELECT e.b AS node, r.lbl FROM reach r JOIN ed2 e ON e.a = r.node
                WHERE r.lbl < e.b
            ),
            cc AS (SELECT node AS doc_id, min(lbl) AS cluster_id
                   FROM reach GROUP BY node)
            SELECT CAST(d.doc_id AS BIGINT) AS doc_id, d.lang,
                   CAST(d.n_chars AS BIGINT) AS n_chars
            FROM documents d
            WHERE d.doc_id NOT IN
                  (SELECT doc_id FROM cc WHERE cluster_id <> doc_id)
        """,
        "winnow_overlap_pairs": _winnow_oracle_sql(
            k=16, window=8, min_shared=4, max_fp_df=32
        ),
    }
