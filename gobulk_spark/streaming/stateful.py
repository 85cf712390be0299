"""Custom stateful streaming operator: per-key ingest session tracking.

gobulk's Tracker keeps mutable per-container state across the run
(started/finished timestamps, tracker/gorm.go:292-298); the Structured
Streaming analogue for custom keyed state is
``applyInPandasWithState``. This operator maintains, per source key
(e.g. source_file prefix, or user id for event streams), a running
session: rows seen, first/last event time, closing the session after a
gap timeout and emitting one summary row per closed session.

This is the engine's extension template for custom stateful operators —
the UDF body is plain pandas over the group's micro-batch rows plus a
typed state tuple.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n_rows LONG, first_ts LONG, last_ts LONG"
OUTPUT_SCHEMA = (
    "key STRING, n_rows LONG, first_ts LONG, last_ts LONG, closed BOOLEAN"
)

GAP_MS = 30 * 60 * 1000


def make_track_sessions(gap_ms: int = GAP_MS):
    """Build the applyInPandasWithState body with a configurable gap.

    Emits a row per update (closed=False) and a final row when the
    processing-time timeout fires with no new data (closed=True) —
    gobulk's FinishContainers moment for the key.
    """

    def track_sessions(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            n, first_ts, last_ts = state.get
            state.remove()
            yield pd.DataFrame(
                [{"key": key[0], "n_rows": n, "first_ts": first_ts,
                  "last_ts": last_ts, "closed": True}]
            )
            return
        n, first_ts, last_ts = state.get if state.exists else (0, None, None)
        for pdf in pdfs:
            # a NULL ts_ms arrives as NaN in a float64 column; astype
            # int64 would raise and kill the whole streaming query —
            # fail closed by skipping the malformed rows instead
            pdf = pdf.dropna(subset=["ts_ms"])
            if pdf.empty:
                continue
            ts = pdf["ts_ms"].astype("int64")
            n += len(pdf)
            lo, hi = int(ts.min()), int(ts.max())
            first_ts = lo if first_ts is None else min(first_ts, lo)
            last_ts = hi if last_ts is None else max(last_ts, hi)
        state.update((n, first_ts, last_ts))
        state.setTimeoutDuration(gap_ms)
        yield pd.DataFrame(
            [{"key": key[0], "n_rows": n, "first_ts": first_ts,
              "last_ts": last_ts, "closed": False}]
        )

    return track_sessions


def session_stream(keyed: DataFrame, gap_ms: int = GAP_MS) -> DataFrame:
    """Wire the stateful operator over a streaming frame with columns
    (key string, ts_ms long).

    NOTE: a processing-time timeout keeps the query generating empty
    micro-batches until all state expires — use a processingTime
    trigger and stop the query explicitly; Trigger.AvailableNow will
    not terminate while sessions remain open.
    """
    return keyed.groupBy("key").applyInPandasWithState(
        make_track_sessions(gap_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
