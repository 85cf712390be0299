"""Pipeline configuration.

gobulk analogue: the Format's knobs (format.go:36-44 bulk sizes,
format.go:132-138 error policy, format.go:20-21 NewIterationOnRestart).
Spark owns task sizing, so the bulk-size knobs map to Arrow batch size
and shuffle partition count.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .rules import DEFAULT_THRESHOLDS, Thresholds


@dataclass(frozen=True)
class PipelineConfig:
    source_path: str
    out_dir: str
    run_id: str = "run-1"
    thresholds: Thresholds = field(default_factory=lambda: DEFAULT_THRESHOLDS)
    # error policy: False = route issues to audit and continue (gobulk
    # FormatWithIssuesTracking); True = raise on first issue (StopOnError)
    stop_on_error: bool = False
    # resume from committed phase checkpoints if present (gobulk
    # NewIterationOnRestart=False semantics); False recomputes everything
    resume: bool = True
    # skip rows already processed by earlier runs in the same out_dir
    # (gobulk marker / LastTrackedContainer semantics)
    incremental: bool = False
    # salted repartition of the expensive parse stage: phash buckets x salt
    phash_buckets: int = 64
    salt_buckets: int = 8
    # broadcast the duplicate-id list when it has fewer rows than this
    # (falls back to a shuffle join above it)
    dup_broadcast_max: int = 5_000_000
    shuffle_partitions: int | None = None  # None = leave session setting
    arrow_batch_rows: int = 2048
    # fused throughput mode: parse is not staged to parquet, it fuses
    # into the store job (decided frame cached for the three writes).
    # Resume granularity coarsens from per-phase to per-run.
    fused: bool = False
