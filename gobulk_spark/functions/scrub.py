"""Compiled-regex PII scrub pass (shared vectorized core).

A fixed, totally-ordered list of (name, pattern, replacement) rules
applied via ``pandas.Series.str.replace`` — the same function object runs
inside the Spark pandas UDF and in the single-node reference labeler, so
scrubbed output strings are equal by construction (the exact-match
contract). Order matters and is part of the contract: e.g. credit cards
must be masked before phone numbers so a 16-digit number is not half
eaten by the phone pattern.

Toxicity is a *drop* rule, not a scrub (see rules.py); scrubbing only
masks PII in otherwise-kept captions.

gobulk analogue: utils/parse.go DecodeXML's regex entity rewriting —
the library-provided byte/text rewrite primitive a Format composes.
"""

from __future__ import annotations

import re

import pandas as pd

SCRUB_RULES: tuple[tuple[str, re.Pattern, str], ...] = (
    ("email", re.compile(r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"), "<EMAIL>"),
    ("ssn", re.compile(r"\b\d{3}-\d{2}-\d{4}\b"), "<SSN>"),
    ("credit_card", re.compile(r"\b\d{4}[ \-]\d{4}[ \-]\d{4}[ \-]\d{4}\b"), "<CC>"),
    (
        "phone",
        re.compile(r"(?:\+\d{1,2}[ \-]?)?(?:\(\d{3}\)\s?|\d{3}[ \-])\d{3}[ \-]\d{4}\b"),
        "<PHONE>",
    ),
    ("ipv4", re.compile(r"\b(?:\d{1,3}\.){3}\d{1,3}\b"), "<IP>"),
)

PII_TOKENS = tuple(repl for _, _, repl in SCRUB_RULES)


def scrub_captions(captions: pd.Series) -> pd.Series:
    """Apply every scrub rule in order; null-safe, returns same index."""
    out = captions.fillna("")
    for _, pat, repl in SCRUB_RULES:
        out = out.str.replace(pat, repl, regex=True)
    return out.where(captions.notna(), None)


def pii_hit_counts(captions: pd.Series) -> pd.DataFrame:
    """Per-rule match counts (for metrics/audit), vectorized.

    Counts run against the PROGRESSIVELY-scrubbed text — the same
    intermediate states scrub_captions actually replaces on — so the
    counts equal what was masked: counting every rule on the raw text
    double-counts nested patterns ('john@192.168.0.1' is one <EMAIL>
    replacement, not email=1 AND ipv4=1)."""
    cur = captions.fillna("")
    cols = {}
    for name, pat, repl in SCRUB_RULES:
        cols[name] = cur.str.count(pat.pattern)
        cur = cur.str.replace(pat, repl, regex=True)
    return pd.DataFrame(cols, index=captions.index)
