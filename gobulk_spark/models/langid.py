"""fastText-style language identification, built from scratch.

Architecture (the public fastText idea, re-expressed without the
library): hashed byte n-gram (1..3) bag-of-features over the lowercased
UTF-8 caption -> per-language log-prob profile -> argmax + softmax
confidence. Profiles are fit once per process from the embedded seed
corpus (models/seed_corpus.py) — a few hundred KB, deterministic, so an
executor-side module import replaces a broadcast variable.

Vectorization: the whole batch is ONE numpy byte buffer. N-gram buckets
come from a polynomial rolling hash computed with array arithmetic —
no Python string objects are ever created in the scoring path (the
earlier char-trigram implementation allocated ~250 tiny strings per
caption; on a 32-worker executor that allocation traffic saturated the
memory bus before the CPUs).

gobulk analogue: a user ``Format.Parse`` stage (format.go:28-29) — the
per-record transform extension point, here as a vectorized model.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .seed_corpus import LANGS, SEED_TEXT

N_BUCKETS = 1 << 15
_MASK = np.int32(N_BUCKETS - 1)  # x % 2^15 == x & (2^15-1) for x >= 0
_P1, _P2 = np.int32(131), np.int32(131 * 131)
_PROFILE: np.ndarray | None = None  # (n_langs, N_BUCKETS) float32


def _flat_bytes(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """(byte_buffer, row_end_offsets) for ' ' + lower(text) + ' ' rows."""
    padded = " " + texts.fillna("").str.lower() + " "
    blobs = padded.str.encode("utf-8").to_numpy()
    lens = np.fromiter((len(b) for b in blobs), dtype=np.int64, count=len(blobs))
    buf = np.frombuffer(b"".join(blobs), dtype=np.uint8).astype(np.int32)
    return buf, np.cumsum(lens)


def _gram_buckets(buf: np.ndarray, ends: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Byte-trigram buckets with their row ids, boundary-masked.

    Trigrams only: measured as accurate as 1+2+3-grams on the seed
    corpus with sharper softmax separation, at a third of the gram
    volume. int32 arithmetic + bitwise-AND bucketing: the max hash is
    (255*131+255)*131+255 < 2^31 and N_BUCKETS is a power of two, so
    this is value-identical to int64 modulo at half the memory traffic.
    """
    n_rows = len(ends)
    lens = np.diff(ends, prepend=0)
    pos_rows = np.repeat(np.arange(n_rows, dtype=np.int32), lens)
    if len(buf) < 3:
        return np.empty(0, np.int32), np.empty(0, np.int32)
    to_end = ends.astype(np.int64)[pos_rows] - np.arange(len(buf), dtype=np.int64)
    h3 = (buf[:-2] * _P2 + buf[1:-1] * _P1 + buf[2:]) & _MASK
    m3 = to_end[:-2] >= 3  # trigram fits inside its row
    return pos_rows[:-2][m3], h3[m3]


def _fit_profile() -> np.ndarray:
    prof = np.zeros((len(LANGS), N_BUCKETS), dtype=np.float64)
    for li, lang in enumerate(LANGS):
        buf, ends = _flat_bytes(pd.Series(SEED_TEXT[lang]))
        _, buckets = _gram_buckets(buf, ends)
        np.add.at(prof[li], buckets, 1.0)
    counts = prof + 0.5
    prof = np.log(counts / counts.sum(axis=1, keepdims=True))
    prof -= prof.mean(axis=0, keepdims=True)  # center: common grams ~ 0
    return prof.astype(np.float32)


def profile() -> np.ndarray:
    global _PROFILE
    if _PROFILE is None:
        _PROFILE = _fit_profile()
    return _PROFILE


def predict(texts: pd.Series) -> pd.DataFrame:
    """Batch language ID. Returns DataFrame(lang: str, lang_conf: float64).

    Empty/null captions get lang='und', conf=0.0.
    """
    n = len(texts)
    prof = profile()
    buf, ends = _flat_bytes(texts)
    rows, buckets = _gram_buckets(buf, ends)
    scores = np.zeros((n, len(LANGS)), dtype=np.float64)
    for li in range(len(LANGS)):
        scores[:, li] = np.bincount(rows, weights=prof[li, buckets], minlength=n)
    lens = np.maximum(np.bincount(rows, minlength=n), 1)
    scores /= lens[:, None]  # length-normalize
    z = scores * 12.0  # temperature: clean captions -> conf ~0.9+
    z -= z.max(axis=1, keepdims=True)
    ez = np.exp(z)
    sm = ez / ez.sum(axis=1, keepdims=True)
    best = np.argmax(sm, axis=1)
    lang = np.array(LANGS, dtype=object)[best]
    conf = sm[np.arange(n), best]
    empty = texts.isna().to_numpy() | (texts.fillna("").str.strip() == "").to_numpy()
    lang[empty] = "und"
    conf[empty] = 0.0
    # preserve the caller's index (every sibling does): a fresh
    # RangeIndex silently NaN-corrupts pandas alignment when the input
    # frame is filtered/sampled (non-default index)
    return pd.DataFrame({"lang": lang, "lang_conf": conf}, index=texts.index)
