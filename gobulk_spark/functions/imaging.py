"""Pure-Python/numpy image codec used on executors inside Arrow batches.

Pillow/libjpeg are not available in this environment, so the engine ships
its own minimal codec:

- A real PNG encoder/decoder (RGB8, zlib is stdlib). This is the lossless
  path and is bit-exact on round-trip.
- A *simulated* lossy path: uniform quantization of the pixel values
  followed by PNG encoding. This is a clearly-marked deterministic
  stand-in for JPEG — it exercises exactly the contract the pipeline
  needs (decoded pixels within PSNR >= 40 dB of the pristine original)
  without a native JPEG library. Rows carry ``fmt='jpeg'`` to mark the
  lossy path; the byte payload is still a valid PNG container.

Everything here is batch-oriented: decode is called per Arrow batch from
``mapInPandas`` (see gobulk_spark.stages), never per row from the driver.

gobulk analogue: the ``utils/zip.go:10-18`` Gunzip / ``utils/parse.go``
DecodeXML scalar helpers — byte-blob decoding as a library function the
user's Parse stage composes.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """Encode an HxWx3 uint8 array as a PNG (color type 2, filter 0)."""
    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected HxWx3 uint8, got {arr.dtype} {arr.shape}")
    h, w = arr.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    # one filter byte (0 = None) per scanline, then raw RGB
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = arr.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


class PngError(ValueError):
    """Raised on malformed PNG payloads; routed to the issue table."""


def decode_png(data: bytes) -> np.ndarray:
    """Decode an RGB8 PNG produced by any encoder using filters 0-4."""
    if not isinstance(data, (bytes, bytearray)) or not data.startswith(_PNG_SIG):
        raise PngError("bad PNG signature")
    pos, w, h, idat = len(_PNG_SIG), None, None, []
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if len(payload) != length:
            raise PngError("truncated chunk")
        if tag == b"IHDR":
            w, h, bitdepth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", payload)
            if bitdepth != 8 or ctype != 2 or interlace != 0:
                raise PngError(f"unsupported PNG (bitdepth={bitdepth} ctype={ctype})")
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w is None or not idat:
        raise PngError("missing IHDR/IDAT")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:  # corrupt deflate stream
        raise PngError(f"bad IDAT: {e}") from e
    stride = w * 3
    if len(raw) != h * (1 + stride):
        raise PngError("bad scanline payload size")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + stride)
    filters = rows[:, 0]
    out = np.zeros((h, stride), dtype=np.uint8)
    if not filters.any():  # fast path: all filter 0 (what encode_png emits)
        out[:] = rows[:, 1:]
        return out.reshape(h, w, 3)
    for y in range(h):  # general path, per-scanline (rare: foreign PNGs)
        f, cur = int(filters[y]), rows[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        line = np.zeros(stride, dtype=np.int32)
        if f == 0:
            line = cur
        elif f == 2:
            line = (cur + prev) & 0xFF
        else:
            for x in range(stride):
                a = line[x - 3] if x >= 3 else 0
                b = prev[x]
                c = prev[x - 3] if x >= 3 else 0
                if f == 1:
                    line[x] = (cur[x] + a) & 0xFF
                elif f == 3:
                    line[x] = (cur[x] + ((a + b) >> 1)) & 0xFF
                elif f == 4:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    line[x] = (cur[x] + pr) & 0xFF
                else:
                    raise PngError(f"unknown filter {f}")
        out[y] = line.astype(np.uint8)
    return out.reshape(h, w, 3)


LOSSY_QUANT_STEP = 4  # PSNR floor ~= 10*log10(255^2 / 1.5) ~= 46.4 dB


def quantize_lossy(arr: np.ndarray, step: int = LOSSY_QUANT_STEP) -> np.ndarray:
    """Deterministic stand-in for a lossy codec: uniform quantization.

    Error per sample is in {-(step-2)..step//2-ish}, giving MSE ~ step^2/12
    and PSNR well above the 40 dB contract for step=4.
    """
    q = (arr.astype(np.int32) // step) * step + step // 2
    return np.clip(q, 0, 255).astype(np.uint8)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch {a.shape} vs {b.shape}")
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))


def synth_image(seed: int, w: int, h: int) -> np.ndarray:
    """Deterministic synthetic RGB image: gradients + seeded noise."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [
            (xx * 255 // max(w - 1, 1)),
            (yy * 255 // max(h - 1, 1)),
            ((xx + yy) * 255 // max(w + h - 2, 1)),
        ],
        axis=-1,
    ).astype(np.int32)
    noise = rng.integers(-24, 25, size=(h, w, 3), dtype=np.int32)
    return np.clip(base + noise, 0, 255).astype(np.uint8)


# ----------------------------------------------------------------- DCQ1
# A real lossy transform codec (JPEG's core, minus the entropy coder):
# per-channel 8x8 DCT-II, JPEG luminance quantization table scaled by a
# quality factor, int16 coefficients zlib-packed. Pure numpy — no
# codec library — so executors decode it anywhere. The north-rule
# lossy-format contract (decoded pixels PSNR >= 40 dB) is exercised by
# a REAL frequency-domain codec, not just uniform quantization.

_DCQ_MAGIC = b"DCQ1"

# ITU-T T.81 Annex K.1 luminance table (public standard)
_DCQ_BASE_Q = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.float64)


def _dct_matrix() -> np.ndarray:
    k = np.arange(8)
    d = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    d[0] *= 1 / np.sqrt(2)
    return d * 0.5  # orthonormal: D @ D.T = I


def _dcq_qtable(quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    q = np.floor((_DCQ_BASE_Q * scale + 50) / 100)
    return np.clip(q, 1, 255)


def _blocks(ch: np.ndarray) -> tuple[np.ndarray, int, int]:
    h, w = ch.shape
    ph, pw = -h % 8, -w % 8
    padded = np.pad(ch, ((0, ph), (0, pw)), mode="edge").astype(np.float64) - 128.0
    hh, ww = padded.shape
    b = padded.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    return b, hh, ww


def encode_dctq(arr: np.ndarray, quality: int = 96) -> bytes:  # 96 -> ~44dB on
    # the noisy synthetic corpus, comfortably above the 40dB contract
    """Encode an RGB uint8 image as DCQ1 (lossy, deterministic)."""
    d = _dct_matrix()
    q = _dcq_qtable(quality)
    h, w = arr.shape[:2]
    planes = []
    for c in range(3):
        b, _hh, _ww = _blocks(arr[..., c])
        coeff = np.einsum("ij,bjk,lk->bil", d, b, d)
        planes.append(np.round(coeff / q).astype(np.int16))
    payload = zlib.compress(np.concatenate(planes).tobytes(), 6)
    return _DCQ_MAGIC + struct.pack("<IIB", h, w, quality) + payload


def decode_dctq(data: bytes) -> np.ndarray:
    """Decode DCQ1 -> RGB uint8; raises PngError on malformed input so
    the issue-routing path treats both codecs uniformly."""
    if data[:4] != _DCQ_MAGIC:
        raise PngError("bad DCQ1 signature")
    try:
        h, w, quality = struct.unpack("<IIB", data[4:13])
        # ValueError covers an odd byte count out of zlib (frombuffer
        # refuses non-multiple-of-2) — every malformed payload must
        # surface as PngError so issue routing stays uniform
        flat = np.frombuffer(zlib.decompress(data[13:]), dtype=np.int16)
    except (struct.error, zlib.error, ValueError) as e:
        raise PngError(f"bad DCQ1 payload: {e}") from e
    hh, ww = h + (-h % 8), w + (-w % 8)
    n_blocks = (hh // 8) * (ww // 8)
    if flat.size != n_blocks * 64 * 3:
        raise PngError("DCQ1 coefficient count mismatch")
    d = _dct_matrix()
    q = _dcq_qtable(quality)
    out = np.empty((hh, ww, 3), dtype=np.float64)
    per = flat.reshape(3, n_blocks, 8, 8).astype(np.float64) * q
    for c in range(3):
        blocks = np.einsum("ji,bjk,kl->bil", d, per[c], d)  # inverse DCT
        out[..., c] = (
            blocks.reshape(hh // 8, ww // 8, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(hh, ww)
        )
    return np.clip(out[:h, :w] + 128.0, 0, 255).astype(np.uint8)


def decode_image(data: bytes) -> np.ndarray:
    """Magic-dispatching decode: PNG (lossless) or DCQ1 (lossy)."""
    if data is None:
        # NULL blob must be PngError (decode_batch's issue-row contract),
        # not a TypeError from the slice below that kills the Arrow task
        raise PngError("null image payload")
    if data[:4] == _DCQ_MAGIC:
        return decode_dctq(data)
    return decode_png(data)
