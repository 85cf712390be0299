"""applyInPandasWithState session tracking over a micro-batched stream."""

from __future__ import annotations

import os
import shutil
import time

import pyarrow as pa
import pyarrow.parquet as pq

from gobulk_spark.streaming.stateful import session_stream

SRC = "/tmp/gobulk_spark_test_corpora/stateful_src"
CKPT = "/tmp/gobulk_spark_test_out/stateful_ckpt"


def test_stateful_session_tracking(spark):
    shutil.rmtree(SRC, ignore_errors=True)
    shutil.rmtree(CKPT, ignore_errors=True)
    os.makedirs(SRC)
    t = pa.table(
        {
            "key": pa.array(["a", "a", "b", "a", "b"]),
            "ts_ms": pa.array([1000, 2000, 5000, 8000, 9000], pa.int64()),
        }
    )
    pq.write_table(t, os.path.join(SRC, "batch0.parquet"))

    stream = (
        spark.readStream.schema("key string, ts_ms long")
        .format("parquet")
        .load(SRC)
    )
    out = session_stream(stream, gap_ms=2000)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(processingTime="500 milliseconds")
        .option("checkpointLocation", CKPT)
        .start()
    )
    try:
        deadline = time.time() + 60
        res = None
        while time.time() < deadline:
            res = spark.sql("SELECT * FROM sessions").toPandas()
            if res["closed"].sum() >= 2:
                break
            time.sleep(1)
    finally:
        q.stop()
    open_rows = res[~res.closed].set_index("key")
    assert open_rows.loc["a", "n_rows"] == 3
    assert open_rows.loc["a", "first_ts"] == 1000
    assert open_rows.loc["a", "last_ts"] == 8000
    assert open_rows.loc["b", "n_rows"] == 2
    # after the gap timeout with no new data, both sessions closed
    closed = res[res.closed].set_index("key")
    assert set(closed.index) == {"a", "b"}
    assert closed.loc["a", "n_rows"] == 3 and closed.loc["b", "n_rows"] == 2
