"""Payload codec helpers (gobulk utils analogues) + multimodal plumbing.

gobulk ships Gunzip (utils/zip.go:10-18) and DecodeXML with entity
expansion (utils/parse.go:13-78) as library scalar helpers for user
Parse stages; JSON parsing appears in its test formats
(runner_test.go:622-635). Here:

- gunzip_series: vectorized gzip decode for binary columns (pandas core
  used inside mapInPandas stages);
- json_caption_schema / parse_json_captions: JVM-side from_json for
  structured caption payloads (F3);
- xml-style entity expansion: expand_entities (F2's regex-rewrite core);
- resize_rgb / thumbnail_batch: REAL nearest-neighbor image resize
  (numpy) over decoded pixels — the image feature-extraction path;
- decode_audio_batch / sample_video_frames: STUBS. No audio/video codec
  library exists in this environment; the Spark-side plumbing (schemas,
  batch signatures) is real and tested, the codec call raises
  NotImplementedError with the contract documented.
"""

from __future__ import annotations

import gzip
import re
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------- gzip (F1)


def gunzip_series(blobs: pd.Series) -> pd.Series:
    """Vectorized-by-batch gzip decode; invalid payloads -> None."""

    def _one(b):
        if b is None:
            return None
        try:
            return gzip.decompress(b)
        except (OSError, zlib.error, EOFError):
            return None

    return blobs.map(_one)


# ------------------------------------------------------------- JSON (F3)

JSON_CAPTION_SCHEMA = T.StructType(
    [
        T.StructField("title", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)


def parse_json_captions(col: Column) -> Column:
    """JVM-side from_json of the gobulk test-format document
    {"title","content"} (runner_test.go:33)."""
    return F.from_json(col, JSON_CAPTION_SCHEMA)


# ----------------------------------------------- XML-ish entity pass (F2)

_ENTITY_RE = re.compile(r"&([A-Za-z][A-Za-z0-9._-]*);")


def expand_entities(texts: pd.Series, entities: dict[str, str]) -> pd.Series:
    """Expand &name; entities from a user-supplied table (the core of
    gobulk's DecodeXML DOCTYPE handling, utils/parse.go:21-77)."""
    return texts.str.replace(
        _ENTITY_RE, lambda m: entities.get(m.group(1), m.group(0)), regex=True
    )


# --------------------------------------------------- image resize (real)


def resize_rgb(arr: np.ndarray, max_side: int) -> np.ndarray:
    """Nearest-neighbor downscale keeping aspect; no-op if small enough."""
    h, w = arr.shape[:2]
    scale = max_side / max(h, w)
    if scale >= 1.0:
        return arr
    nh, nw = max(1, int(h * scale)), max(1, int(w * scale))
    yy = (np.arange(nh) * (h / nh)).astype(np.int64)
    xx = (np.arange(nw) * (w / nw)).astype(np.int64)
    return arr[yy][:, xx]


THUMBNAIL_SCHEMA = "image_id string, thumb binary, thumb_w int, thumb_h int"


def thumbnail_batch(pdf: pd.DataFrame, max_side: int = 32) -> pd.DataFrame:
    """One Arrow batch: decode -> resize -> re-encode thumbnails.

    Used via mapInPandas; undecodable rows yield null thumbs.
    """
    from .imaging import PngError, decode_png, encode_png

    ids, thumbs, ws, hs = [], [], [], []
    for image_id, blob in zip(pdf["image_id"], pdf["bytes"]):
        ids.append(image_id)
        try:
            t = resize_rgb(decode_png(blob), max_side)
            thumbs.append(encode_png(t))
            hs.append(t.shape[0])
            ws.append(t.shape[1])
        except PngError:
            thumbs.append(None)
            ws.append(-1)
            hs.append(-1)
    return pd.DataFrame(
        {
            "image_id": ids,
            "thumb": thumbs,
            "thumb_w": pd.array(ws, dtype="int32"),
            "thumb_h": pd.array(hs, dtype="int32"),
        }
    )


# ------------------------------------------- audio / video (stubbed codecs)

AUDIO_FEATURES_SCHEMA = (
    "clip_id string, sample_rate int, n_samples long, duration_s double, "
    "rms double, peak double"
)

VIDEO_FRAMES_SCHEMA = (
    "clip_id string, frame_idx int, ts_ms long, frame_png binary, w int, h int"
)


def decode_audio_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """STUB — no audio codec library (ffmpeg/soundfile) in this image.

    Contract when a codec is available: input batch columns
    (clip_id string, bytes binary); decode each blob to PCM float32,
    return one row per clip with AUDIO_FEATURES_SCHEMA columns (rms/peak
    over the waveform, vectorized numpy). The mapInPandas wiring,
    partitioning and schema are exercised by tests against this stub.
    """
    raise NotImplementedError(
        "audio decode requires a codec library not present in this environment; "
        "plug a decoder into decode_audio_batch keeping AUDIO_FEATURES_SCHEMA"
    )


def sample_video_frames(pdf: pd.DataFrame, every_ms: int = 1000) -> pd.DataFrame:
    """STUB — no video codec library in this image.

    Contract: input (clip_id string, bytes binary); demux + decode,
    sample one frame per ``every_ms``, emit VIDEO_FRAMES_SCHEMA rows
    (frames re-encoded PNG). Frame sampling keeps batches bounded:
    emit rows incrementally per clip, never materialize a whole video.
    """
    raise NotImplementedError(
        "video decode requires a codec library not present in this environment; "
        "plug a decoder into sample_video_frames keeping VIDEO_FRAMES_SCHEMA"
    )
