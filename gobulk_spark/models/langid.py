"""fastText-style language identification, built from scratch.

Architecture (the public fastText idea, re-expressed without the library):
hashed character n-gram (1..3) bag-of-features -> per-language log-prob
profile -> argmax + softmax confidence. Profiles are fit once per process
from the embedded seed corpus (models/seed_corpus.py) — a few hundred KB,
deterministic, so an executor-side module import replaces a broadcast
variable (closures never pickle the matrix; see pyspark guide pitfalls).

Vectorization: the batch of captions is exploded to a flat trigram
Series, factorized so Python hashes only *unique* n-grams, then scored
with L bincounts — no per-row Python in the scoring path.

gobulk analogue: a user ``Format.Parse`` stage (format.go:28-29) — the
per-record transform extension point, here as a vectorized model.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.hashing import crc_bucket_unique
from .seed_corpus import LANGS, SEED_TEXT

N_BUCKETS = 1 << 15
_PROFILE: np.ndarray | None = None  # (n_langs, N_BUCKETS) float32 log-probs


def _char_ngrams(text: str) -> list[str]:
    t = f" {text.lower()} "
    out = list(t)
    out += [t[i : i + 2] for i in range(len(t) - 1)]
    out += [t[i : i + 3] for i in range(len(t) - 2)]
    return out


def _fit_profile() -> np.ndarray:
    prof = np.zeros((len(LANGS), N_BUCKETS), dtype=np.float64)
    for li, lang in enumerate(LANGS):
        for sent in SEED_TEXT[lang]:
            for g in _char_ngrams(sent):
                prof[li, crc_bucket_unique(np.array([g], dtype=object), N_BUCKETS)[0]] += 1.0
    # add-0.5 smoothed log-probs per language
    counts = prof + 0.5
    prof = np.log(counts / counts.sum(axis=1, keepdims=True))
    # center per bucket so uninformative n-grams contribute ~0
    prof -= prof.mean(axis=0, keepdims=True)
    return prof.astype(np.float32)


def profile() -> np.ndarray:
    global _PROFILE
    if _PROFILE is None:
        _PROFILE = _fit_profile()
    return _PROFILE


def _flat_ngrams(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Explode a caption Series to (row_ids, bucket_ids) flat arrays."""
    padded = " " + texts.fillna("").str.lower() + " "
    grams: list[str] = []
    rows: list[int] = []
    # pandas str ops can't emit variable-length n-gram lists without a
    # python pass; do one pass building the flat list, then factorize so
    # hashing cost is O(unique n-grams), not O(total).
    for i, t in enumerate(padded.to_numpy()):
        n = len(t)
        g = list(t)
        g += [t[j : j + 2] for j in range(n - 1)]
        g += [t[j : j + 3] for j in range(n - 2)]
        grams.extend(g)
        rows.extend([i] * len(g))
    if not grams:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    codes, uniques = pd.factorize(np.asarray(grams, dtype=object))
    buckets = crc_bucket_unique(np.asarray(uniques, dtype=object), N_BUCKETS)[codes]
    return np.asarray(rows, dtype=np.int64), buckets


def predict(texts: pd.Series) -> pd.DataFrame:
    """Batch language ID. Returns DataFrame(lang: str, lang_conf: float64).

    Empty/null captions get lang='und', conf=0.0.
    """
    n = len(texts)
    prof = profile()
    rows, buckets = _flat_ngrams(texts)
    scores = np.zeros((n, len(LANGS)), dtype=np.float64)
    for li in range(len(LANGS)):
        scores[:, li] = np.bincount(rows, weights=prof[li, buckets], minlength=n)
    lens = np.maximum(np.bincount(rows, minlength=n), 1)
    scores /= lens[:, None]  # length-normalize
    # temperature chosen so clean single-language captions get conf >~ 0.9
    z = scores * 12.0
    z -= z.max(axis=1, keepdims=True)
    ez = np.exp(z)
    sm = ez / ez.sum(axis=1, keepdims=True)
    best = np.argmax(sm, axis=1)
    lang = np.array(LANGS, dtype=object)[best]
    conf = sm[np.arange(n), best]
    empty = texts.isna().to_numpy() | (texts.fillna("").str.strip() == "").to_numpy()
    lang[empty] = "und"
    conf[empty] = 0.0
    return pd.DataFrame({"lang": lang, "lang_conf": conf})
