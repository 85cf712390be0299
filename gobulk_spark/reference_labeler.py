"""Single-node pure-pandas reference labeler → golden labels.

Runs the exact shared cores (functions.textstats / functions.scrub /
models / rules) over the full corpus in one process, with no Spark — the
oracle that the distributed pipeline is graded against (F1>=0.99 keep/
drop, exact scrubbed-caption match, PSNR>=40dB pixel invariance).

Decision text basis: captions are scrubbed FIRST, all quality features
are computed on the scrubbed text (quality judges what will be stored),
and kept rows store the scrubbed caption. This ordering is part of the
contract and is mirrored by the Spark plan stage.

gobulk analogue: the expected-output assertions of runner_test.go
(TestSimpleRun's output element checks) generalized to a full corpus.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from .functions import textstats
from .functions.imaging import PngError, decode_image
from .functions.scrub import scrub_captions
from .models import langid, perplexity
from .rules import DEFAULT_THRESHOLDS, Thresholds, decide, toxicity_hits


def content_hash(bytes_col: pd.Series, caption_col: pd.Series) -> pd.Series:
    """sha256 over (image bytes || 0x00 || utf8 caption) — the dedup key.

    gobulk analogue: Container.ContentHash / TrackContainers' unique key
    (container.go:20, tracker/gorm.go:442-449).
    """
    return pd.Series(
        [
            hashlib.sha256((b or b"") + b"\x00" + (c or "").encode("utf-8")).hexdigest()
            for b, c in zip(bytes_col, caption_col)
        ],
        index=bytes_col.index,
    )


def image_quality_features(arr: np.ndarray) -> tuple[float, float, float]:
    """(brightness, entropy, edge_strength) of one decoded RGB image.

    - brightness: mean luma (Rec.601 weights);
    - entropy: Shannon entropy of the 16-bin luma histogram, bits [0, 4]
      (solid-color images -> 0, textured -> high);
    - edge_strength: mean absolute horizontal+vertical luma gradient
      (a cheap blur/flatness score).
    All float64 numpy — bit-identical between labeler and Spark stage.
    """
    luma = (
        0.299 * arr[..., 0].astype(np.float64)
        + 0.587 * arr[..., 1]
        + 0.114 * arr[..., 2]
    )
    brightness = float(luma.mean())
    hist = np.bincount(
        (np.clip(luma, 0, 255).astype(np.int64) >> 4).ravel(), minlength=16
    ).astype(np.float64)
    p = hist / hist.sum()
    nz = p > 0
    entropy = float(-(p[nz] * np.log2(p[nz])).sum())
    gx = np.abs(np.diff(luma, axis=1)).mean() if luma.shape[1] > 1 else 0.0
    gy = np.abs(np.diff(luma, axis=0)).mean() if luma.shape[0] > 1 else 0.0
    return brightness, entropy, float(gx + gy)


def decode_batch(bytes_col: pd.Series) -> pd.DataFrame:
    """Decode each blob + pixel quality features; failures become issue
    markers, not exceptions.

    Returns DataFrame(decoded_w int32, decoded_h int32, pix_mean float64,
    brightness float64, pix_entropy float64, edge_strength float64,
    decode_ok bool, issue_note str|None).
    """
    ws, hs, means, brights, ents, edges, oks, notes = [], [], [], [], [], [], [], []
    for b in bytes_col:
        try:
            arr = decode_image(b)  # magic dispatch: PNG or DCQ1 (lossy)
            hs.append(arr.shape[0])
            ws.append(arr.shape[1])
            means.append(float(arr.mean()))
            br, en, ed = image_quality_features(arr)
            brights.append(br)
            ents.append(en)
            edges.append(ed)
            oks.append(True)
            notes.append(None)
        except PngError as e:
            ws.append(-1)
            hs.append(-1)
            means.append(float("nan"))
            brights.append(float("nan"))
            ents.append(float("nan"))
            edges.append(float("nan"))
            oks.append(False)
            notes.append(str(e))
    return pd.DataFrame(
        {
            "decoded_w": pd.array(ws, dtype="int32"),
            "decoded_h": pd.array(hs, dtype="int32"),
            "pix_mean": means,
            "brightness": brights,
            "pix_entropy": ents,
            "edge_strength": edges,
            "decode_ok": oks,
            "issue_note": pd.array(notes, dtype=object),
        },
        index=bytes_col.index,
    )


def compute_features(pairs: pd.DataFrame) -> pd.DataFrame:
    """Full feature frame over scrubbed captions (shared-core calls only)."""
    scrubbed = scrub_captions(pairs["caption"])
    dec = decode_batch(pairs["bytes"])
    lid = langid.predict(scrubbed)
    feat = pd.DataFrame(
        {
            "image_id": pairs["image_id"],
            "caption": scrubbed,
            "w": pairs["w"].astype("int32"),
            "h": pairs["h"].astype("int32"),
            "decoded_w": dec["decoded_w"],
            "decoded_h": dec["decoded_h"],
            "pix_mean": dec["pix_mean"],
            "brightness": dec["brightness"],
            "pix_entropy": dec["pix_entropy"],
            "edge_strength": dec["edge_strength"],
            "decode_ok": dec["decode_ok"],
            "issue_note": dec["issue_note"],
            "n_chars": textstats.n_chars(scrubbed),
            "n_words": textstats.n_words(scrubbed),
            "symbol_ratio": textstats.symbol_ratio(scrubbed),
            "digit_ratio": textstats.digit_ratio(scrubbed),
            "char_run": textstats.has_char_run(scrubbed),
            "max_word_freq_ratio": textstats.max_word_freq_ratio(scrubbed),
            "lang": lid["lang"],
            "lang_conf": lid["lang_conf"],
            "ppl": perplexity.score(scrubbed),
            "toxicity_hits": toxicity_hits(scrubbed),
        },
        index=pairs.index,
    )
    feat["stopword_density"] = textstats.stopword_density(scrubbed, feat["lang"])
    return feat


def label(pairs: pd.DataFrame, t: Thresholds = DEFAULT_THRESHOLDS) -> pd.DataFrame:
    """Golden labels for a pairs frame.

    Columns: image_id, keep, drop_reason, scrubbed_caption, lang,
    lang_conf, ppl, decode_ok, issue_note, is_duplicate, content_hash.

    Semantics: duplicates (same content_hash, not the first image_id) are
    omitted before labeling; undecodable images are issues (keep=False,
    drop_reason=None, decode_ok=False).
    """
    feat = compute_features(pairs)
    chash = content_hash(pairs["bytes"], pairs["caption"])
    first_id = chash.map(
        pd.DataFrame({"h": chash, "i": pairs["image_id"]}).groupby("h")["i"].min()
    )
    is_dup = pairs["image_id"] != first_id
    dec = decide(feat, t)
    keep = dec["keep"] & feat["decode_ok"] & ~is_dup
    reason = dec["drop_reason"].where(feat["decode_ok"], None)
    reason = reason.where(~is_dup, "duplicate")
    return pd.DataFrame(
        {
            "image_id": pairs["image_id"],
            "keep": keep,
            "drop_reason": reason,
            "scrubbed_caption": feat["caption"],
            "lang": feat["lang"],
            "lang_conf": feat["lang_conf"],
            "ppl": feat["ppl"],
            "decode_ok": feat["decode_ok"],
            "issue_note": feat["issue_note"],
            "is_duplicate": is_dup,
            "content_hash": chash,
        },
        index=pairs.index,
    )
