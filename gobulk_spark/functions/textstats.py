"""Vectorized token-level caption features (shared core).

This module is THE single implementation of token-level heuristics used
by both the single-node reference labeler and the Spark parse stage —
sharing it is what makes exact keep/drop agreement achievable by
construction. Char-level features have a parallel Spark-native (JVM)
implementation in functions/heuristics.py; tests assert exact agreement.

All functions take/return pandas Series aligned on the input index.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from ..models.seed_corpus import STOPWORDS

WORD_RE = re.compile(r"\S+")
# char-level regexes — mirrored in heuristics.py as JVM expressions
SYMBOL_RE = re.compile(r"[^\w\s]", re.UNICODE)
DIGIT_RE = re.compile(r"[0-9]")
CHAR_RUN_RE = re.compile(r"(.)\1{7,}", re.DOTALL)

_ALL_STOPWORDS = frozenset().union(*STOPWORDS.values())


def n_chars(captions: pd.Series) -> pd.Series:
    return captions.fillna("").str.len().astype("int64")


def n_words(captions: pd.Series) -> pd.Series:
    return captions.fillna("").str.count(WORD_RE).astype("int64")


def symbol_ratio(captions: pd.Series) -> pd.Series:
    nc = n_chars(captions)
    syms = captions.fillna("").str.count(SYMBOL_RE)
    return (syms / nc.where(nc > 0, 1)).astype("float64")


def digit_ratio(captions: pd.Series) -> pd.Series:
    nc = n_chars(captions)
    digs = captions.fillna("").str.count(DIGIT_RE)
    return (digs / nc.where(nc > 0, 1)).astype("float64")


def has_char_run(captions: pd.Series) -> pd.Series:
    import warnings

    with warnings.catch_warnings():
        # the backreference needs a group; we want containment, not extraction
        warnings.simplefilter("ignore", UserWarning)
        return captions.fillna("").str.contains(CHAR_RUN_RE, regex=True)


def _token_lists(captions: pd.Series) -> pd.Series:
    return captions.fillna("").str.lower().str.findall(WORD_RE)


def max_word_freq_ratio(captions: pd.Series) -> pd.Series:
    """max token frequency / token count (0.0 when no tokens).

    Vectorized via one flat factorize + a (row, token-code) group count —
    Python never loops over rows.
    """
    toks = _token_lists(captions)
    counts = toks.str.len().to_numpy(dtype=np.int64)
    n = len(captions)
    flat = [t for row in toks for t in row]
    out = np.zeros(n, dtype=np.float64)
    if flat:
        codes, _ = pd.factorize(np.asarray(flat, dtype=object))
        rows = np.repeat(np.arange(n, dtype=np.int64), counts)
        key = rows * (codes.max() + 1) + codes
        _, inv, per_key = np.unique(key, return_inverse=True, return_counts=True)
        per_tok = per_key[inv]  # for each token: its frequency within its row
        np.maximum.at(out, rows, per_tok.astype(np.float64))
        nz = counts > 0
        out[nz] = out[nz] / counts[nz]
    return pd.Series(out, index=captions.index, name="max_word_freq_ratio")


def stopword_density(captions: pd.Series, langs: pd.Series | None = None) -> pd.Series:
    """Fraction of tokens that are stopwords of the predicted language.

    When ``langs`` is None (or a language has no list), the union list is
    used — keeps the rule meaningful for 'und'.
    """
    toks = _token_lists(captions)
    counts = toks.str.len().to_numpy(dtype=np.int64)
    n = len(captions)
    flat = [t for row in toks for t in row]
    out = np.zeros(n, dtype=np.float64)
    if flat:
        rows = np.repeat(np.arange(n, dtype=np.int64), counts)
        flat_arr = np.asarray(flat, dtype=object)
        codes, uniques = pd.factorize(flat_arr)
        if langs is None:
            is_stop_u = np.fromiter((u in _ALL_STOPWORDS for u in uniques), bool, len(uniques))
            hits = np.bincount(rows, weights=is_stop_u[codes].astype(np.float64), minlength=n)
        else:
            lang_arr = langs.fillna("und").to_numpy()
            hits = np.zeros(n, dtype=np.float64)
            for lang in pd.unique(lang_arr):
                sw = STOPWORDS.get(lang, _ALL_STOPWORDS)
                is_stop_u = np.fromiter((u in sw for u in uniques), bool, len(uniques))
                row_mask = lang_arr == lang
                tok_mask = row_mask[rows]
                hits += np.bincount(
                    rows[tok_mask],
                    weights=is_stop_u[codes[tok_mask]].astype(np.float64),
                    minlength=n,
                )
        nz = counts > 0
        out[nz] = hits[nz] / counts[nz]
    return pd.Series(out, index=captions.index, name="stopword_density")
