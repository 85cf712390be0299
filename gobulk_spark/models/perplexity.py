"""KenLM-style n-gram perplexity scorer, built from scratch.

A hashed bigram language model with stupid backoff to unigrams, fit at
import time on the embedded multilingual seed corpus. Scoring is fully
vectorized: tokens are factorized (Python hashes only unique tokens),
bigram buckets come from numpy arithmetic on adjacent token buckets, and
per-caption mean log-prob is a bincount — the "batched n-gram hashing"
required by the design brief.

ppl = exp(-mean(log P(w_i | w_{i-1})))   (lower = more natural text)

gobulk analogue: a user ``Format.Parse`` model stage (format.go:28-29).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from ..functions.hashing import crc_bucket_unique
from .seed_corpus import SEED_TEXT

N_BUCKETS = 1 << 16
_BACKOFF = np.log(0.4)
_TOKEN_RE = re.compile(r"[^\W\d_]+", re.UNICODE)  # letters only, stable both sides

_UNI: np.ndarray | None = None
_BI: np.ndarray | None = None
_OOV_LP: float = 0.0


def _tokenize_one(text: str) -> list[str]:
    return _TOKEN_RE.findall(text.lower())


def _bigram_bucket(b1: np.ndarray, b2: np.ndarray) -> np.ndarray:
    return (b1 * 1000003 + b2) % N_BUCKETS


def _fit() -> tuple[np.ndarray, np.ndarray, float]:
    uni = np.zeros(N_BUCKETS, dtype=np.float64)
    bi = np.zeros(N_BUCKETS, dtype=np.float64)
    total = 0
    for sents in SEED_TEXT.values():
        for s in sents:
            toks = _tokenize_one(s)
            b = crc_bucket_unique(np.asarray(toks, dtype=object), N_BUCKETS)
            np.add.at(uni, b, 1.0)
            if len(b) > 1:
                np.add.at(bi, _bigram_bucket(b[:-1], b[1:]), 1.0)
            total += len(toks)
    v = float((uni > 0).sum())
    oov_lp = float(np.log(0.1 / (total + v)))
    uni_lp = np.where(uni > 0, np.log((uni + 0.1) / (total + 0.1 * v)), oov_lp)
    # P(w2|w1) ~ count(w1,w2) / count(w1-as-first); approximate the
    # denominator with the unigram count of w1 (hashed, close enough)
    bi_lp = np.full(N_BUCKETS, np.nan)
    seen = bi > 0
    bi_lp[seen] = np.log(bi[seen]) - np.log(total)  # joint; conditioned below
    return uni_lp.astype(np.float32), bi_lp.astype(np.float32), oov_lp


def _tables() -> tuple[np.ndarray, np.ndarray, float]:
    global _UNI, _BI, _OOV_LP
    if _UNI is None:
        _UNI, _BI, _OOV_LP = _fit()
    return _UNI, _BI, _OOV_LP


def score(texts: pd.Series) -> pd.Series:
    """Batch perplexity. Null/empty/sub-2-token captions get ppl = OOV ceiling."""
    uni_lp, bi_lp, oov_lp = _tables()
    n = len(texts)
    toks_per_row = texts.fillna("").str.lower().str.findall(_TOKEN_RE)
    counts = toks_per_row.str.len().to_numpy(dtype=np.int64)
    flat = [t for row in toks_per_row for t in row]
    ceiling = float(np.exp(-oov_lp))
    if not flat:
        return pd.Series(np.full(n, ceiling), index=texts.index, name="ppl")
    codes, uniques = pd.factorize(np.asarray(flat, dtype=object))
    buckets = crc_bucket_unique(np.asarray(uniques, dtype=object), N_BUCKETS)[codes]
    rows = np.repeat(np.arange(n, dtype=np.int64), counts)
    # token log-probs: bigram where the (prev,cur) bucket was seen AND the
    # previous token is in the same caption; else backoff to unigram
    lp = uni_lp[buckets].astype(np.float64)
    if len(buckets) > 1:
        bg = _bigram_bucket(buckets[:-1], buckets[1:])
        bglp = bi_lp[bg]
        same_row = rows[:-1] == rows[1:]
        use_bi = same_row & ~np.isnan(bglp)
        cur = lp[1:]
        # conditional bigram lp = joint - unigram(prev); floor at unigram+backoff
        cond = bglp - uni_lp[buckets[:-1]].astype(np.float64)
        cur = np.where(use_bi, np.maximum(cond, cur + _BACKOFF), cur + np.where(same_row, _BACKOFF, 0.0))
        lp[1:] = cur
    sums = np.bincount(rows, weights=lp, minlength=n)
    means = sums / np.maximum(counts, 1)
    ppl = np.exp(-means)
    ppl[counts == 0] = ceiling
    return pd.Series(np.minimum(ppl, ceiling), index=texts.index, name="ppl")
