"""Null/NaN feature semantics: both decision engines must fail CLOSED.

The pandas core's numpy comparisons turn NaN into False before
decide()'s fillna(True) can act; the Spark side coalesces null rule
conditions to fired. These tests pin the contract: a null feature
drops the row (with the owning rule as drop_reason), EXCEPT when SQL
three-valued logic says otherwise (null AND false = false — a null
conjunct cannot fire a compound rule whose other conjunct is
definitely false).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from gobulk_spark.functions import textstats
from gobulk_spark.rules import DEFAULT_THRESHOLDS, decide, toxicity_hits

CLEAN = "the quick brown fox jumps over the lazy dog near a river bank"
SHORT = "the cat sat"  # 3 words: >= min_words, < word_rep/stopword minimums

BASE = {
    "w": 256, "h": 256, "decoded_w": 256, "decoded_h": 256,
    "pix_entropy": 3.0, "brightness": 128.0,
    "lang": "en", "lang_conf": 0.9, "ppl": 100.0,
    "max_word_freq_ratio": 0.1, "stopword_density": 0.2,
}

# (case name, caption, {feature: None}, expected drop_reason or None)
CASES = [
    ("clean", CLEAN, {}, None),
    ("nan_ppl", CLEAN, {"ppl": None}, "high_perplexity"),
    ("nan_lang_conf", CLEAN, {"lang_conf": None}, "lang_conf_low"),
    ("nan_stopword", CLEAN, {"stopword_density": None}, "low_stopword_density"),
    ("nan_word_freq", CLEAN, {"max_word_freq_ratio": None}, "word_repetition"),
    ("nan_brightness", CLEAN, {"brightness": None}, "image_bad_exposure"),
    ("nan_entropy", CLEAN, {"pix_entropy": None}, "image_flat"),
    ("nan_decoded_w", CLEAN, {"decoded_w": None}, "image_meta_mismatch"),
    # least/greatest SKIP nulls on the Spark side — a single null
    # dimension must still fire image_too_small on BOTH engines
    ("nan_w", CLEAN, {"w": None}, "image_too_small"),
    ("nan_h", CLEAN, {"h": None}, "image_too_small"),
    # 3VL: null conjunct + definitely-false other conjunct = no fire.
    # SHORT has 3 words (< word_rep_min_words=5, < stopword_min_words=10)
    ("nan_word_freq_short", SHORT, {"max_word_freq_ratio": None}, None),
    ("nan_stopword_short", SHORT, {"stopword_density": None}, None),
]


def _feature_frame() -> pd.DataFrame:
    rows = []
    for name, caption, overrides, _ in CASES:
        row = {"case": name, "caption": caption, **BASE}
        row.update(overrides)
        rows.append(row)
    feat = pd.DataFrame(rows)
    cap = feat["caption"]
    feat["n_chars"] = textstats.n_chars(cap)
    feat["n_words"] = textstats.n_words(cap)
    feat["symbol_ratio"] = textstats.symbol_ratio(cap)
    feat["digit_ratio"] = textstats.digit_ratio(cap)
    feat["char_run"] = textstats.has_char_run(cap)
    feat["toxicity_hits"] = toxicity_hits(cap)
    return feat


def test_pandas_core_fails_closed_on_nan():
    feat = _feature_frame()
    dec = decide(feat, DEFAULT_THRESHOLDS)
    for (name, _cap, _ovr, expected), keep, reason in zip(
        CASES, dec["keep"], dec["drop_reason"]
    ):
        assert keep == (expected is None), f"{name}: keep={keep}"
        assert reason == expected, f"{name}: reason={reason} expected={expected}"


def test_spark_plan_matches_pandas_on_nan(spark):
    """decision_columns over parse-shaped rows with null model features
    must agree with rules.decide row-for-row — including the nulls."""
    from gobulk_spark.plan import decision_columns
    from gobulk_spark.stages import PARSE_OUTPUT_SCHEMA

    rows = []
    for i, (name, caption, overrides, _) in enumerate(CASES):
        r = {
            "image_id": name, "source_file": "t", "content_hash": f"h{i}",
            "w": BASE["w"], "h": BASE["h"],
            "fmt": "png", "phash": i, "scrubbed_caption": caption,
            "decoded_w": BASE["decoded_w"], "decoded_h": BASE["decoded_h"],
            "pix_mean": 128.0, "brightness": BASE["brightness"],
            "pix_entropy": BASE["pix_entropy"], "edge_strength": 1.0,
            "decode_ok": True, "issue_note": None, "lang": BASE["lang"],
            "lang_conf": BASE["lang_conf"], "ppl": BASE["ppl"],
            "max_word_freq_ratio": BASE["max_word_freq_ratio"],
            "stopword_density": BASE["stopword_density"],
        }
        r.update(overrides)
        rows.append(tuple(r.values()))
    cols = [
        "image_id", "source_file", "content_hash",
        "w", "h", "fmt", "phash", "scrubbed_caption",
        "decoded_w", "decoded_h", "pix_mean", "brightness", "pix_entropy",
        "edge_strength", "decode_ok", "issue_note", "lang", "lang_conf", "ppl",
        "max_word_freq_ratio", "stopword_density",
    ]
    df = spark.createDataFrame(rows, schema=PARSE_OUTPUT_SCHEMA)
    assert df.columns == cols
    got = {
        r["image_id"]: (r["keep"], r["drop_reason"])
        for r in decision_columns(df, DEFAULT_THRESHOLDS).collect()
    }
    feat = _feature_frame()
    dec = decide(feat, DEFAULT_THRESHOLDS)
    for (name, _cap, _ovr, expected) in CASES:
        keep, reason = got[name]
        assert keep == (expected is None), f"spark {name}: keep={keep}"
        assert reason == expected, f"spark {name}: reason={reason}"
    # and the pandas frame agrees cell-for-cell with Spark
    for (name, *_), k, r in zip(CASES, dec["keep"], dec["drop_reason"]):
        assert (k, r if pd.notna(r) else None) == got[name], name
