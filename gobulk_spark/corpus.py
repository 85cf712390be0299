"""Deterministic synthetic image+caption corpus (seed=42 default).

Generates the source table mandated by the target schema:
``(image_id string, bytes binary, w int, h int, fmt string,
caption string, phash long)`` plus a side table ``planted.parquet``
recording which defect was planted per row (test introspection only —
the pipeline never reads it).

Defect classes exercise every rule in rules.RULE_ORDER, the PII scrub
pass, the dedup phase (exact duplicate payloads under fresh image_ids),
the issue path (undecodable image bytes) and phash skew (a few hot
buckets so salted repartitioning has something to fix).

This is generator/fixture code — clarity over vectorization is fine
here; the *pipeline* hot path stays vectorized.

gobulk analogue: the in-memory mock fixtures of runner_test.go:552-962.
"""

from __future__ import annotations

import os
import random

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .functions.imaging import encode_png, quantize_lossy, synth_image
from .functions.hashing import stable_int64
from .models.seed_corpus import LANGS, SEED_TEXT, STOPWORDS

LANG_WEIGHTS = {"en": 0.40, "de": 0.12, "fr": 0.12, "es": 0.12, "it": 0.12, "pt": 0.12}

# (defect, weight). Weights are relative; 'clean' absorbs the rest to 1.0.
DEFECTS: tuple[tuple[str, float], ...] = (
    ("clean", 0.58),
    ("pii_email", 0.03),
    ("pii_phone", 0.02),
    ("pii_ssn", 0.015),
    ("pii_cc", 0.015),
    ("pii_ip", 0.01),
    ("too_short", 0.03),
    ("too_long", 0.02),
    ("symbol_soup", 0.03),
    ("digit_soup", 0.02),
    ("char_run", 0.02),
    ("word_rep", 0.03),
    ("no_stopwords", 0.02),
    ("word_soup_ppl", 0.04),
    ("toxic", 0.03),
    ("unknown_lang", 0.02),
    ("img_small", 0.02),
    ("img_aspect", 0.015),
    ("img_meta_mismatch", 0.01),
    ("img_flat", 0.012),
    ("img_dark", 0.012),
    ("img_corrupt", 0.015),
    ("dup_exact", 0.02),
)

_PII_SAMPLES = {
    "pii_email": ["contact me at {u}@example.com", "mail {u}@photos.org for prints"],
    "pii_phone": ["call 555-{a}-{b} for details", "phone (555) {a}-{b} anytime"],
    "pii_ssn": ["ssn 123-45-{b} was printed on it", "the form shows 987-65-{b}"],
    "pii_cc": ["card 4111 1111 1111 {b} visible", "paid with 5500-0000-0000-{b}"],
    "pii_ip": ["uploaded from 192.168.{c}.{d}", "server 10.0.{c}.{d} hosts it"],
}

_CONSONANTS = "bcdfghjklmnpqrstvwxz"


def _content_words(lang: str) -> list[str]:
    sw = STOPWORDS[lang]
    words = {w for s in SEED_TEXT[lang] for w in s.split() if w not in sw and len(w) > 3}
    return sorted(words)


def _pick_lang(rng: random.Random) -> str:
    r = rng.random()
    acc = 0.0
    for lang, w in LANG_WEIGHTS.items():
        acc += w
        if r < acc:
            return lang
    return "en"


def _clean_caption(rng: random.Random, lang: str) -> str:
    s = rng.choice(SEED_TEXT[lang])
    if rng.random() < 0.3:
        s = s + " " + rng.choice(SEED_TEXT[lang])
    return s


def _caption_for(defect: str, rng: random.Random) -> tuple[str, str]:
    """Returns (caption, lang_hint). English hosts for defect payloads keep
    language signals unambiguous."""
    lang = _pick_lang(rng)
    if defect == "clean":
        return _clean_caption(rng, lang), lang
    if defect in _PII_SAMPLES:
        tmpl = rng.choice(_PII_SAMPLES[defect])
        pii = tmpl.format(
            u=f"user{rng.randrange(100, 999)}",
            a=f"{rng.randrange(100, 999)}",
            b=f"{rng.randrange(1000, 9999)}",
            c=rng.randrange(1, 254),
            d=rng.randrange(1, 254),
        )
        return _clean_caption(rng, "en") + " " + pii, "en"
    if defect == "too_short":
        return rng.choice(["a dog", "nice", "wow!!", "img", ""]), lang
    if defect == "too_long":
        s = _clean_caption(rng, lang)
        reps = []
        while sum(len(x) for x in reps) < 540:
            reps.append(rng.choice(SEED_TEXT[lang]))
        return s + " " + " ".join(reps), lang
    if defect == "symbol_soup":
        syms = "".join(rng.choice("#$%&@!*^~|<>{}[]") for _ in range(30))
        return f"photo {syms} of {syms[:10]} things", "en"
    if defect == "digit_soup":
        nums = " ".join(str(rng.randrange(10, 99999)) for _ in range(12))
        return f"lot {nums} items", "en"
    if defect == "char_run":
        return _clean_caption(rng, "en") + " so" + "o" * rng.randrange(8, 15) + " cool", "en"
    if defect == "word_rep":
        w = rng.choice(_content_words("en"))
        return " ".join([w] * rng.randrange(6, 12)) + " photo", "en"
    if defect == "no_stopwords":
        words = rng.sample(_content_words("en"), 12)
        return " ".join(words), "en"
    if defect == "word_soup_ppl":
        # confidently-English words incl. stopwords (so stopword-density
        # passes) in an improbable order -> high perplexity fires
        words = [rng.choice(_content_words("en")) for _ in range(11)]
        words += rng.sample(sorted(STOPWORDS["en"]), 3)
        rng.shuffle(words)
        return " ".join(words), "en"
    if defect == "toxic":
        from .rules import TOXIC_WORDS

        return _clean_caption(rng, "en") + f" you {rng.choice(TOXIC_WORDS)}", "en"
    if defect == "unknown_lang":
        toks = ["".join(rng.choice(_CONSONANTS) for _ in range(rng.randrange(3, 6))) for _ in range(9)]
        return " ".join(toks), "und"
    # image defects carry clean captions so the image rule fires first
    return _clean_caption(rng, "en"), "en"


def _dims_for(defect: str, rng: random.Random) -> tuple[int, int]:
    if defect == "img_small":
        return rng.randrange(8, 31), rng.randrange(24, 64)
    if defect == "img_aspect":
        return 32, rng.randrange(160, 256)
    side = rng.randrange(32, 72, 8)
    other = rng.randrange(32, 72, 8)
    return side, other


_HOT_PHASH = [stable_int64(f"hot-bucket-{i}") for i in range(8)]


def _phash_for(rng: random.Random, image_id: str) -> int:
    # intentionally skewed: 60% of rows land in 8 hot buckets
    if rng.random() < 0.6:
        v = (rng.choice(_HOT_PHASH) & ~0xFF) | rng.randrange(0, 4)
    else:
        v = stable_int64(image_id)
    return v - (1 << 64) if v >= (1 << 63) else v


def generate_pairs(n_rows: int, seed: int = 42) -> tuple[pa.Table, pa.Table]:
    """Returns (pairs_table, planted_table)."""
    rng = random.Random(seed)
    names = [d for d, _ in DEFECTS]
    weights = [w for _, w in DEFECTS]
    ids, blobs, ws, hs, fmts, caps, phashes, planted = [], [], [], [], [], [], [], []
    donors: list[int] = []  # indices eligible as duplicate donors
    for i in range(n_rows):
        defect = rng.choices(names, weights=weights, k=1)[0]
        image_id = f"img-{i:08x}"
        if defect == "dup_exact" and donors:
            j = rng.choice(donors)
            ids.append(image_id)
            blobs.append(blobs[j])
            ws.append(ws[j])
            hs.append(hs[j])
            fmts.append(fmts[j])
            caps.append(caps[j])
            phashes.append(phashes[j])
            planted.append("dup_exact")
            continue
        if defect == "dup_exact":
            defect = "clean"
        caption, _ = _caption_for(defect, rng)
        w, h = _dims_for(defect, rng)
        img = synth_image(seed * 1_000_003 + i, w, h)
        if defect == "img_flat":  # solid color -> zero luma entropy
            img = np.full_like(img, rng.randrange(60, 200))
        elif defect == "img_dark":  # near-black exposure
            img = (img.astype(np.int32) // 16).astype(np.uint8)
        fmt = "png" if rng.random() < 0.5 else "jpeg"
        if fmt == "jpeg":
            img = quantize_lossy(img)
        data = encode_png(img)
        if defect == "img_corrupt":
            data = data[: max(24, int(len(data) * 0.5))]
        meta_w, meta_h = w, h
        if defect == "img_meta_mismatch":
            meta_w = w + 3
        ids.append(image_id)
        blobs.append(data)
        ws.append(meta_w)
        hs.append(meta_h)
        fmts.append(fmt)
        caps.append(caption)
        phashes.append(_phash_for(rng, image_id))
        planted.append(defect)
        if defect == "clean":
            donors.append(i)
    pairs = pa.table(
        {
            "image_id": pa.array(ids, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "w": pa.array(ws, pa.int32()),
            "h": pa.array(hs, pa.int32()),
            "fmt": pa.array(fmts, pa.string()),
            "caption": pa.array(caps, pa.string()),
            "phash": pa.array(phashes, pa.int64()),
        }
    )
    planted_t = pa.table(
        {"image_id": pa.array(ids, pa.string()), "planted": pa.array(planted, pa.string())}
    )
    return pairs, planted_t


def ensure_corpus(out_dir: str, n_rows: int, seed: int = 42) -> str:
    """Write pairs.parquet + planted.parquet under out_dir if absent.

    Row-group size is kept small so Spark/parquet splits give real
    parallelism even on a single file.
    """
    import json

    pairs_path = os.path.join(out_dir, "pairs.parquet")
    stamp_path = os.path.join(out_dir, "_params.json")
    stamp = {"n_rows": n_rows, "seed": seed}
    if os.path.exists(pairs_path):
        # the cache is only valid for the SAME (n_rows, seed): silently
        # returning a stale smaller corpus would make a scaled-up bench
        # measure the wrong data with no error
        try:
            if json.load(open(stamp_path)) == stamp:
                return pairs_path
        except (OSError, ValueError):
            pass  # pre-stamp cache or corrupt stamp: rebuild
        os.remove(pairs_path)
    os.makedirs(out_dir, exist_ok=True)
    pairs, planted = generate_pairs(n_rows, seed)
    pq.write_table(pairs, pairs_path, row_group_size=max(1024, n_rows // 64))
    pq.write_table(planted, os.path.join(out_dir, "planted.parquet"))
    with open(stamp_path, "w") as f:
        json.dump(stamp, f)
    return pairs_path
