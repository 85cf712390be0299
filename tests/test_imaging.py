"""PNG codec + lossy-simulation contracts (pure python, no Spark)."""

import numpy as np
import pytest

from gobulk_spark.functions.imaging import (
    LOSSY_QUANT_STEP,
    PngError,
    decode_png,
    encode_png,
    psnr,
    quantize_lossy,
    synth_image,
)


def test_roundtrip_exact():
    img = synth_image(7, 40, 28)
    assert img.shape == (28, 40, 3)
    out = decode_png(encode_png(img))
    np.testing.assert_array_equal(out, img)


def test_deterministic_generation():
    a, b = synth_image(123, 16, 16), synth_image(123, 16, 16)
    np.testing.assert_array_equal(a, b)
    assert encode_png(a) == encode_png(b)


def test_lossy_psnr_contract():
    img = synth_image(99, 64, 48)
    q = quantize_lossy(img, LOSSY_QUANT_STEP)
    assert psnr(img, q) >= 40.0
    # lossy path is still losslessly containerized: decode is exact vs q
    np.testing.assert_array_equal(decode_png(encode_png(q)), q)


@pytest.mark.parametrize(
    "blob",
    [b"", b"not a png", encode_png(synth_image(1, 8, 8))[:30], None],
)
def test_decode_errors_are_typed(blob):
    with pytest.raises(PngError):
        decode_png(blob)


def test_foreign_filters_supported():
    # scanlines filtered with Sub(1)/Up(2) by a hand-rolled encoder variant
    import struct
    import zlib

    from gobulk_spark.functions import imaging

    img = synth_image(5, 10, 6)
    h, w = img.shape[:2]
    stride = w * 3
    lines = []
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        cur = img[y].reshape(stride).astype(np.int32)
        if y % 2 == 0:  # Sub
            shifted = np.concatenate([np.zeros(3, np.int32), cur[:-3]])
            lines.append(b"\x01" + ((cur - shifted) & 0xFF).astype(np.uint8).tobytes())
        else:  # Up
            lines.append(b"\x02" + ((cur - prev) & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + imaging._chunk(b"IHDR", ihdr)
        + imaging._chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + imaging._chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(decode_png(data), img)
