"""dropDuplicatesWithinWatermark-based streaming dedup: re-deliveries
within the horizon are dropped across micro-batches (state persists in
the stream checkpoint); the state is watermark-bounded by design."""

from __future__ import annotations

import os
import shutil

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from gobulk_spark.streaming.dedup import dedup_within_watermark

BASE = "/tmp/gobulk_spark_test_out/stream_dedup"
SCHEMA = "content_hash string, image_id string, ts timestamp"


def _write(path: str, rows: list[tuple[str, str, str]]) -> None:
    pdf = pd.DataFrame(rows, columns=["content_hash", "image_id", "ts"])
    # watermarks need TIMESTAMP (LTZ): write tz-aware microsecond stamps
    pdf["ts"] = (
        pd.to_datetime(pdf["ts"]).dt.tz_localize("UTC").astype("datetime64[us, UTC]")
    )
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), path)


def _drain(spark, src_dir: str, out_dir: str, ckpt: str) -> None:
    stream = spark.readStream.schema(SCHEMA).format("parquet").option(
        "maxFilesPerTrigger", "1"  # one file per micro-batch: dedup must
    ).load(src_dir)                # work ACROSS batches via state
    deduped = dedup_within_watermark(stream, ("content_hash",), "ts", "1 hour")
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_streaming_dedup_across_microbatches(spark):
    shutil.rmtree(BASE, ignore_errors=True)
    src, out, ckpt = (os.path.join(BASE, d) for d in ("src", "out", "ckpt"))
    os.makedirs(src)
    _write(os.path.join(src, "f1.parquet"), [
        ("h1", "img-1", "2024-01-01 10:00:00"),
        ("h2", "img-2", "2024-01-01 10:01:00"),
    ])
    _write(os.path.join(src, "f2.parquet"), [
        ("h1", "img-1b", "2024-01-01 10:05:00"),  # re-delivery, diff ts
        ("h3", "img-3", "2024-01-01 10:06:00"),
    ])
    _drain(spark, src, out, ckpt)
    got = pd.concat(
        [pd.read_parquet(os.path.join(out, f)) for f in os.listdir(out)
         if f.endswith(".parquet")],
        ignore_index=True,
    )
    # h1's second arrival (different image_id AND ts) was dropped by key
    assert sorted(got["content_hash"]) == ["h1", "h2", "h3"]
    assert "img-1b" not in set(got["image_id"])

    # a later run over NEW files keeps deduping against checkpoint state
    _write(os.path.join(src, "f3.parquet"), [
        ("h2", "img-2b", "2024-01-01 10:20:00"),  # still within 1h horizon
        ("h4", "img-4", "2024-01-01 10:21:00"),
    ])
    _drain(spark, src, out, ckpt)
    got2 = pd.concat(
        [pd.read_parquet(os.path.join(out, f)) for f in os.listdir(out)
         if f.endswith(".parquet")],
        ignore_index=True,
    )
    assert sorted(got2["content_hash"]) == ["h1", "h2", "h3", "h4"]
    assert "img-2b" not in set(got2["image_id"])
