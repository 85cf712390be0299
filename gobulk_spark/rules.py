"""Keep/drop decision rules: thresholds, total order, pandas core.

The rule list below is the *single source of truth* for decision
semantics. It is consumed twice:

- ``decide()`` here — the pandas core, used by the single-node reference
  labeler (reference_labeler.py) that produces golden labels;
- ``gobulk_spark.plan.decision_columns()`` — the same rules as a Spark
  ``F.when`` chain over pre-computed feature columns.

A unit test asserts the two agree exactly on the synthetic corpus; the
F1>=0.99 contract then holds by construction.

First-fired-rule-wins, in the fixed order of ``RULE_ORDER`` — mirrors
gobulk's deterministic stable re-sort after parallel phases
(``parser.go:92-94``) and its first-error-wins Issue per container
(``planner.go:44-111``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np
import pandas as pd

ALLOWED_LANGS = frozenset({"en", "de", "fr", "es", "it", "pt"})

# Mild toxicity lexicon (synthetic-corpus scale; swap for a real lexicon
# in production). ASCII-only so \b semantics agree between Python re and
# Java regex (Spark rlike).
TOXIC_WORDS: tuple[str, ...] = (
    "idiot", "stupid", "moron", "hate", "kill", "dumb", "loser",
    "garbage human", "shut up", "worthless", "disgusting",
)
TOXIC_RE = re.compile(r"(?i)\b(?:" + "|".join(w.replace(" ", r"\s+") for w in TOXIC_WORDS) + r")\b")


@dataclass(frozen=True)
class Thresholds:
    min_chars: int = 8
    max_chars: int = 512
    min_words: int = 2
    min_image_side: int = 32
    max_aspect: float = 4.0
    min_pix_entropy: float = 1.0  # bits over a 16-bin luma histogram
    min_brightness: float = 20.0
    max_brightness: float = 235.0
    max_symbol_ratio: float = 0.30
    max_digit_ratio: float = 0.40
    max_word_freq_ratio: float = 0.40
    word_rep_min_words: int = 5
    min_lang_conf: float = 0.60
    min_stopword_density: float = 0.05
    stopword_min_words: int = 10
    max_ppl: float = 1000.0


DEFAULT_THRESHOLDS = Thresholds()

# (rule_name, feature columns consumed). Order IS the contract.
RULE_ORDER: tuple[str, ...] = (
    "caption_missing",
    "too_short_chars",
    "too_few_words",
    "too_long_chars",
    "image_too_small",
    "bad_aspect_ratio",
    "image_meta_mismatch",
    "image_bad_exposure",
    "image_flat",
    "high_symbol_ratio",
    "high_digit_ratio",
    "char_repetition",
    "word_repetition",
    "lang_conf_low",
    "lang_not_allowed",
    "low_stopword_density",
    "high_perplexity",
    "toxicity",
)


def rule_masks(feat: pd.DataFrame, t: Thresholds = DEFAULT_THRESHOLDS) -> dict[str, pd.Series]:
    """Boolean mask per rule, aligned with ``feat``.

    Required feature columns: caption, n_chars, n_words, w, h, decoded_w,
    decoded_h, symbol_ratio, digit_ratio, char_run, max_word_freq_ratio,
    lang, lang_conf, stopword_density, ppl, toxicity_hits.
    """
    cap = feat["caption"]
    blank = cap.isna() | (cap.fillna("").str.strip() == "")
    wh_min = np.minimum(feat["w"], feat["h"])
    wh_max = np.maximum(feat["w"], feat["h"]).astype("float64")
    aspect = wh_max / np.maximum(wh_min, 1)

    def closed(mask, *cols: str):
        """Fail CLOSED on null features: numpy comparisons turn NaN into
        False, which would fail open before decide()'s fillna(True) ever
        sees an NA — mirror the Spark side's coalesce(cond, True)."""
        out = pd.Series(np.asarray(mask, dtype=bool), index=feat.index)
        for c in cols:
            out |= feat[c].isna()
        return out

    def and3(a_mask, a_col: str, b_mask, b_col: str):
        """coalesce(A AND B, TRUE) under SQL three-valued logic: a NULL
        conjunct fires the rule UNLESS the other conjunct is definitely
        false (null AND false = false on the Spark side)."""
        a, b = pd.Series(np.asarray(a_mask, dtype=bool), index=feat.index), pd.Series(
            np.asarray(b_mask, dtype=bool), index=feat.index
        )
        a_na, b_na = feat[a_col].isna(), feat[b_col].isna()
        return (a & b) | (a_na & (b | b_na)) | (b_na & a)

    return {
        "caption_missing": blank,
        "too_short_chars": closed(feat["n_chars"] < t.min_chars, "n_chars"),
        "too_few_words": closed(feat["n_words"] < t.min_words, "n_words"),
        "too_long_chars": closed(feat["n_chars"] > t.max_chars, "n_chars"),
        "image_too_small": closed(wh_min < t.min_image_side, "w", "h"),
        "bad_aspect_ratio": closed(aspect > t.max_aspect, "w", "h"),
        "image_meta_mismatch": closed(
            (feat["decoded_w"] != feat["w"]) | (feat["decoded_h"] != feat["h"]),
            "decoded_w", "decoded_h", "w", "h",
        ),
        "image_flat": closed(feat["pix_entropy"] < t.min_pix_entropy, "pix_entropy"),
        "image_bad_exposure": closed(
            (feat["brightness"] < t.min_brightness)
            | (feat["brightness"] > t.max_brightness),
            "brightness",
        ),
        "high_symbol_ratio": closed(
            feat["symbol_ratio"] > t.max_symbol_ratio, "symbol_ratio"
        ),
        "high_digit_ratio": closed(feat["digit_ratio"] > t.max_digit_ratio, "digit_ratio"),
        "char_repetition": closed(feat["char_run"].fillna(True).astype(bool), "char_run"),
        "word_repetition": and3(
            feat["max_word_freq_ratio"] > t.max_word_freq_ratio,
            "max_word_freq_ratio",
            feat["n_words"] >= t.word_rep_min_words,
            "n_words",
        ),
        "lang_conf_low": closed(feat["lang_conf"] < t.min_lang_conf, "lang_conf"),
        "lang_not_allowed": ~feat["lang"].isin(sorted(ALLOWED_LANGS)),
        "low_stopword_density": and3(
            feat["stopword_density"] < t.min_stopword_density,
            "stopword_density",
            feat["n_words"] >= t.stopword_min_words,
            "n_words",
        ),
        "high_perplexity": closed(feat["ppl"] > t.max_ppl, "ppl"),
        "toxicity": closed(feat["toxicity_hits"] > 0, "toxicity_hits"),
    }


def decide(feat: pd.DataFrame, t: Thresholds = DEFAULT_THRESHOLDS) -> pd.DataFrame:
    """First-fired-wins decision. Returns DataFrame(keep: bool, drop_reason: str|None)."""
    masks = rule_masks(feat, t)
    reason = pd.Series([None] * len(feat), index=feat.index, dtype=object)
    undecided = pd.Series(True, index=feat.index)
    for name in RULE_ORDER:
        fired = undecided & masks[name].fillna(True)  # null feature = fail closed
        reason[fired] = name
        undecided &= ~fired
    return pd.DataFrame({"keep": reason.isna(), "drop_reason": reason}, index=feat.index)


def toxicity_hits(captions: pd.Series) -> pd.Series:
    return captions.fillna("").str.count(TOXIC_RE).astype("int64")
