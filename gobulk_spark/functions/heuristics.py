"""Char-level caption heuristics as JVM-side Column expressions.

These stay inside whole-stage codegen (no Python worker round-trip) and
are the Spark-native mirror of functions/textstats.py's pandas core.
Regex dialect notes (Java vs Python), verified by an exact-agreement
test over the synthetic corpus:

- ``(?U)`` turns on UNICODE_CHARACTER_CLASS so Java ``\\w`` matches the
  same letters Python's unicode-default ``\\w`` does;
- ``(?s)`` = re.DOTALL for the char-run backreference;
- digits are ``[0-9]`` (ASCII) on both sides on purpose;
- counts are exact ints and ratio division is IEEE double on both sides,
  so equality is exact, not approximate;
- caveat: Python len() counts code points, Java length() counts UTF-16
  units — they agree on the BMP; astral chars (emoji) would differ.
  Spark's ``length()`` also counts code points, so the pair used here
  (length vs str.len) agrees even beyond the BMP.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..rules import TOXIC_WORDS

SYMBOL_PATTERN = r"(?U)[^\w\s]"
DIGIT_PATTERN = "[0-9]"
WORD_PATTERN = r"\S+"
CHAR_RUN_PATTERN = r"(?s)(.)\1{7,}"
TOXIC_PATTERN = r"(?i)\b(?:" + "|".join(w.replace(" ", r"\s+") for w in TOXIC_WORDS) + r")\b"


def _nn(caption: Column) -> Column:
    return F.coalesce(caption, F.lit(""))


def n_chars(caption: Column) -> Column:
    return F.length(_nn(caption)).cast("long")


def n_words(caption: Column) -> Column:
    return F.regexp_count(_nn(caption), F.lit(WORD_PATTERN)).cast("long")


def symbol_ratio(caption: Column) -> Column:
    return F.regexp_count(_nn(caption), F.lit(SYMBOL_PATTERN)) / F.greatest(
        n_chars(caption), F.lit(1)
    )


def digit_ratio(caption: Column) -> Column:
    return F.regexp_count(_nn(caption), F.lit(DIGIT_PATTERN)) / F.greatest(
        n_chars(caption), F.lit(1)
    )


def has_char_run(caption: Column) -> Column:
    return _nn(caption).rlike(CHAR_RUN_PATTERN)


def toxicity_hits(caption: Column) -> Column:
    return F.regexp_count(_nn(caption), F.lit(TOXIC_PATTERN)).cast("long")


def is_blank(caption: Column) -> Column:
    # regexp strip, NOT F.trim: trim removes only spaces, while the
    # pandas reference (rules.rule_masks) uses str.strip() — a
    # tab/newline-only caption must fire caption_missing on BOTH sides
    # or the drop_reason parity contract breaks ('\s' matches the
    # ASCII whitespace set Python strip() covers on this corpus)
    return caption.isNull() | (
        F.regexp_replace(caption, r"^\s+|\s+$", "") == F.lit("")
    )


def content_hash(bytes_col: Column, caption: Column) -> Column:
    """sha256 over (bytes || 0x00 || utf8(caption)) — must equal the
    hashlib implementation in reference_labeler.content_hash."""
    payload = F.concat(
        F.coalesce(bytes_col, F.lit(b"")),
        F.lit(b"\x00"),
        F.encode(F.coalesce(caption, F.lit("")), "UTF-8"),
    )
    return F.sha2(payload, 256)


def feature_columns(caption: Column) -> dict[str, Column]:
    """All char-level features keyed by canonical feature name."""
    return {
        "n_chars": n_chars(caption),
        "n_words": n_words(caption),
        "symbol_ratio": symbol_ratio(caption),
        "digit_ratio": digit_ratio(caption),
        "char_run": has_char_run(caption),
        "toxicity_hits": toxicity_hits(caption),
    }
