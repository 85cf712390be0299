"""Streaming dedup with watermark-bounded state.

The batch engine dedups via the (image_id, content_hash) marker
anti-join — correct, but the marker grows with history. For an
unbounded stream the Spark-native answer is
``dropDuplicatesWithinWatermark``: state holds ONE entry per key seen
within the watermark horizon and the engine evicts expired keys, so
memory is bounded by the key-arrival rate × watermark, not by stream
lifetime. gobulk analogue: TrackContainers' uniqueness check
(tracker/gorm.go:114-138) restricted to the re-delivery window — the
right trade for at-least-once sources (Kafka, file listings) whose
duplicates arrive close together.

Semantics: the FIRST row per key within the horizon is emitted;
re-arrivals within the watermark are dropped even if their event time
differs (unlike plain dropDuplicates on (key, ts)). A duplicate
arriving AFTER the horizon re-emits — cross-horizon exactness needs
the batch marker (both layers compose: stream dedup bounds state,
the marker anti-join at the sink guarantees idempotent storage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_within_watermark(
    stream: DataFrame,
    key_cols: tuple[str, ...],
    ts_col: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Drop re-deliveries of the same key within the watermark horizon.

    ``stream`` must be a streaming DataFrame with an event-time column
    ``ts_col``; state is evicted once the watermark passes a key's
    last-seen time.
    """
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )
