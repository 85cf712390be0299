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


def test_dctq_roundtrip_meets_psnr_contract():
    """The REAL lossy codec (8x8 DCT + JPEG luminance table): decoded
    pixels within PSNR >= 40 dB at the default quality, across sizes
    incl. non-multiples of 8."""
    from gobulk_spark.functions.imaging import (
        decode_dctq, decode_image, encode_dctq, psnr, synth_image,
    )

    for seed, w, h in ((0, 64, 48), (1, 100, 77), (2, 8, 8), (3, 33, 9), (4, 7, 5)):
        img = synth_image(seed, w, h)
        blob = encode_dctq(img)
        dec = decode_image(blob)
        assert dec.shape == img.shape
        assert psnr(img, dec) >= 40.0, (seed, w, h)
    # deterministic encode (no RNG): byte-identical across calls
    img = synth_image(9, 40, 40)
    assert encode_dctq(img) == encode_dctq(img)


def test_dctq_corrupt_payloads_raise_png_error():
    from gobulk_spark.functions.imaging import PngError, decode_dctq, encode_dctq, synth_image

    import pytest as _pytest

    blob = encode_dctq(synth_image(1, 16, 16))
    with _pytest.raises(PngError, match="signature"):
        decode_dctq(b"NOPE" + blob[4:])
    with _pytest.raises(PngError, match="payload|mismatch"):
        decode_dctq(blob[:20])  # truncated zlib stream
    with _pytest.raises(PngError, match="mismatch"):
        # valid container, wrong coefficient count
        import struct, zlib
        import numpy as np
        bad = b"DCQ1" + struct.pack("<IIB", 16, 16, 96) + zlib.compress(
            np.zeros(7, dtype=np.int16).tobytes()
        )
        decode_dctq(bad)


def test_pipeline_processes_lossy_rows_end_to_end(spark):
    """DCQ1 rows flow through the full pipeline: decoded dims match the
    declared w/h (no image_meta_mismatch), rows kept, PSNR contract on
    what the executor decoded."""
    import os
    import shutil

    import pandas as _pd
    import pyarrow as _pa
    import pyarrow.parquet as _pq

    from gobulk_spark import lineage
    from gobulk_spark.config import PipelineConfig
    from gobulk_spark.corpus import SEED_TEXT
    from gobulk_spark.functions.imaging import encode_dctq, encode_png, synth_image
    from gobulk_spark.pipeline import run_pipeline

    base = "/tmp/gobulk_spark_test_out/lossy"
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    cap = SEED_TEXT["en"][0] + " " + SEED_TEXT["en"][1]
    rows = []
    for i in range(6):
        img = synth_image(100 + i, 64, 48)
        blob = encode_dctq(img) if i % 2 == 0 else encode_png(img)
        rows.append((f"img-{i}", blob, 64, 48, "dctq" if i % 2 == 0 else "png",
                     cap, i * 7919))
    pdf = _pd.DataFrame(rows, columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"])
    src = os.path.join(base, "src.parquet")
    _pq.write_table(_pa.Table.from_pandas(pdf, preserve_index=False), src)
    s = run_pipeline(spark, PipelineConfig(source_path=src, out_dir=os.path.join(base, "out"), run_id="r1"))
    assert s["phases"]["store"]["issues"] == 0
    kept = lineage.read_kept(spark, os.path.join(base, "out")).toPandas()
    assert len(kept) == 6  # lossy and lossless rows all kept
    assert set(kept["fmt"]) == {"dctq", "png"}
