"""JVM heuristics (functions/heuristics.py) vs pandas core — exact parity.

The Spark plan stage evaluates char-level features with Java regexes in
whole-stage codegen; the reference labeler uses Python re via pandas.
These must agree EXACTLY on the corpus (counts are ints, ratios are the
same IEEE division) or the F1 contract degrades silently.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gobulk_spark.functions import heuristics as H
from gobulk_spark.functions import textstats as T
from gobulk_spark.functions.scrub import scrub_captions
from gobulk_spark.rules import toxicity_hits


@pytest.fixture(scope="module")
def captions(corpus_1500):
    _, pairs, _ = corpus_1500
    return scrub_captions(pairs["caption"])


@pytest.fixture(scope="module")
def jvm_feats(spark, captions):
    sdf = spark.createDataFrame(pd.DataFrame({"c": captions}))
    cols = H.feature_columns(F.col("c"))
    return (
        sdf.select(
            F.col("c"),
            *[v.alias(k) for k, v in cols.items()],
            H.is_blank(F.col("c")).alias("is_blank"),
        )
        .toPandas()
        .sort_values("c", kind="stable")
        .reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def py_feats(captions):
    pdf = pd.DataFrame(
        {
            "c": captions,
            "n_chars": T.n_chars(captions),
            "n_words": T.n_words(captions),
            "symbol_ratio": T.symbol_ratio(captions),
            "digit_ratio": T.digit_ratio(captions),
            "char_run": T.has_char_run(captions),
            "toxicity_hits": toxicity_hits(captions),
            "is_blank": captions.isna() | (captions.fillna("").str.strip() == ""),
        }
    )
    return pdf.sort_values("c", kind="stable").reset_index(drop=True)


@pytest.mark.parametrize(
    "col", ["n_chars", "n_words", "char_run", "toxicity_hits", "is_blank"]
)
def test_integer_and_bool_features_exact(jvm_feats, py_feats, col):
    mism = jvm_feats[col].to_numpy() != py_feats[col].to_numpy()
    assert not mism.any(), py_feats.loc[mism, ["c", col]].head(10)


@pytest.mark.parametrize("col", ["symbol_ratio", "digit_ratio"])
def test_ratio_features_bit_exact(jvm_feats, py_feats, col):
    np.testing.assert_array_equal(
        jvm_feats[col].to_numpy(), py_feats[col].to_numpy()
    )


def test_content_hash_matches_hashlib(spark, corpus_1500):
    from gobulk_spark.functions.heuristics import content_hash
    from gobulk_spark.reference_labeler import content_hash as ref_hash

    _, pairs, _ = corpus_1500
    sample = pairs.head(200)
    sdf = spark.createDataFrame(sample[["image_id", "bytes", "caption"]])
    got = (
        sdf.select("image_id", content_hash(F.col("bytes"), F.col("caption")).alias("h"))
        .toPandas()
        .set_index("image_id")["h"]
    )
    want = ref_hash(sample["bytes"], sample["caption"])
    want.index = sample["image_id"]
    assert (got.sort_index() == want.sort_index()).all()


def test_adversarial_strings(spark):
    """Edge inputs where Java/Python regex dialects most often diverge."""
    cases = pd.Series(
        [
            None,
            "",
            "   ",
            "ümlaut ärgerößen",  # unicode letters must NOT count as symbols
            "naïve café—dash…ellipsis",  # punctuation beyond ASCII
            "١٢٣ arabic digits",  # non-ASCII digits: not [0-9] on either side
            "tab\tand\nnewline  spaced",
            "aaaaaaaa",  # exactly 8-run
            "aaaaaaa",  # 7-run: below threshold
            "x" * 600,
            "mixed 123 !!! ... ??? end",
            "HATE this; you idiot!",  # toxicity, case-insensitive
            "shut  up now",  # multi-space phrase hit
        ]
    )
    sdf = spark.createDataFrame(pd.DataFrame({"c": cases}))
    cols = H.feature_columns(F.col("c"))
    jvm = sdf.select(*[v.alias(k) for k, v in cols.items()]).toPandas()
    assert jvm["n_chars"].tolist() == T.n_chars(cases).tolist()
    assert jvm["n_words"].tolist() == T.n_words(cases).tolist()
    np.testing.assert_array_equal(
        jvm["symbol_ratio"].to_numpy(), T.symbol_ratio(cases).to_numpy()
    )
    np.testing.assert_array_equal(
        jvm["digit_ratio"].to_numpy(), T.digit_ratio(cases).to_numpy()
    )
    assert jvm["char_run"].tolist() == T.has_char_run(cases).tolist()
    assert jvm["toxicity_hits"].tolist() == toxicity_hits(cases).tolist()
