"""The plan phase: keep/drop decision as pure Column expressions.

gobulk analogue: Planner.PlanBulkOperations + the user's Format.Plan
(planner.go:44-111, format.go:30-31) — Elements in, Operations out.
Here the "operation" is a pair of columns (action, rule_fired) computed
by a single ``F.when`` chain in exactly rules.RULE_ORDER, entirely
inside whole-stage codegen.

Char-level features come from functions/heuristics.py (JVM regex);
token/model features were produced by the parse stage. Rule semantics
must equal rules.rule_masks + rules.decide exactly — a test asserts
agreement row-for-row on the synthetic corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .functions import heuristics as H
from .rules import ALLOWED_LANGS, RULE_ORDER, Thresholds


def rule_conditions(t: Thresholds) -> dict[str, Column]:
    """Boolean Column per rule name over the parse-stage output columns.

    Mirrors rules.rule_masks: same thresholds, same strict/non-strict
    comparisons. Null conditions fail closed (coalesce to fired) like the
    pandas core's ``fillna(True)``.
    """
    cap = F.col("scrubbed_caption")
    feats = H.feature_columns(cap)
    # least/greatest SKIP nulls (least(NULL, 100) = 100), but the pandas
    # core fails closed on a null dimension — force null w/h to null
    # results so coalesce(cond, True) fires on the SAME rule both sides
    wh_null = F.col("w").isNull() | F.col("h").isNull()
    wh_min = F.when(~wh_null, F.least("w", "h"))
    aspect = F.when(
        ~wh_null, F.greatest("w", "h").cast("double") / F.greatest(wh_min, F.lit(1))
    )
    return {
        "caption_missing": H.is_blank(cap),
        "too_short_chars": feats["n_chars"] < t.min_chars,
        "too_few_words": feats["n_words"] < t.min_words,
        "too_long_chars": feats["n_chars"] > t.max_chars,
        "image_too_small": wh_min < t.min_image_side,
        "bad_aspect_ratio": aspect > t.max_aspect,
        "image_meta_mismatch": (F.col("decoded_w") != F.col("w"))
        | (F.col("decoded_h") != F.col("h")),
        "image_flat": F.col("pix_entropy") < t.min_pix_entropy,
        "image_bad_exposure": (F.col("brightness") < t.min_brightness)
        | (F.col("brightness") > t.max_brightness),
        "high_symbol_ratio": feats["symbol_ratio"] > t.max_symbol_ratio,
        "high_digit_ratio": feats["digit_ratio"] > t.max_digit_ratio,
        "char_repetition": feats["char_run"],
        "word_repetition": (F.col("max_word_freq_ratio") > t.max_word_freq_ratio)
        & (F.col("n_words") >= t.word_rep_min_words),
        "lang_conf_low": F.col("lang_conf") < t.min_lang_conf,
        "lang_not_allowed": ~F.col("lang").isin(*sorted(ALLOWED_LANGS)),
        "low_stopword_density": (F.col("stopword_density") < t.min_stopword_density)
        & (F.col("n_words") >= t.stopword_min_words),
        "high_perplexity": F.col("ppl") > t.max_ppl,
        "toxicity": feats["toxicity_hits"] > 0,
    }


def decision_columns(df: DataFrame, t: Thresholds) -> DataFrame:
    """Append n_words (needed by two rules), drop_reason, keep, action.

    action: 'create' (keep) | 'omit' (dropped by rule) | 'issue'
    (undecodable image — routed, never decided; gobulk issue.go:137-146).
    """
    df = df.withColumn("n_words", H.n_words(F.col("scrubbed_caption")))
    conds = rule_conditions(t)
    chain = None
    for name in RULE_ORDER:
        fired = F.coalesce(conds[name], F.lit(True))  # null feature = fail closed
        chain = F.when(fired, name) if chain is None else chain.when(fired, name)
    reason = chain.otherwise(F.lit(None))
    df = df.withColumn(
        "drop_reason", F.when(F.col("decode_ok"), reason).otherwise(F.lit(None))
    )
    df = df.withColumn("keep", F.col("decode_ok") & F.col("drop_reason").isNull())
    return df.withColumn(
        "action",
        F.when(~F.col("decode_ok"), F.lit("issue"))
        .when(F.col("keep"), F.lit("create"))
        .otherwise(F.lit("omit")),
    )
