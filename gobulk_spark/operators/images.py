"""Image-level near-duplicate detection over perceptual hashes.

The corpus schema carries a 64-bit ``phash`` per image (BASELINE.json
input_hint; the synthetic corpus plants the hot-bucket skew the
north-star's "salted repartitioning on phash buckets" clause refers
to). A perceptual hash IS a simhash over pixel space — two re-encoded /
resized copies of one image differ in a few bits — so near-dup image
detection is the same 64-bit hamming-radius problem the text simhash
operator solves, and this module reuses that machinery rather than
growing a second banding implementation (gobulk has no image dedup; its
TrackContainers dedup is exact-hash only, tracker/gorm.go:61-118 —
this operator is part of the training-data tranche, per Zhu et al.'s
near-dup findings for web-scale image corpora).

Scale shape (inherited from simhash_near_dups): b bands of ~64/b bits
sized by generalized pigeonhole to GUARANTEE recall at the radius,
multi-probe keys chosen by a measured cost model, map-side JVM
bit_count verification, and a hot-bucket guard for non-discriminative
keys — the planted 60%-in-8-buckets phash skew is exactly the shape
the guard bounds at 10^12 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import simhash_near_dups


def phash_near_dup_images(
    images: DataFrame,
    id_col: str = "image_id",
    phash_col: str = "phash",
    max_hamming: int = 4,
    max_bucket_size: int | str | None = "auto",
    probe_radius: int | None = None,
    n_rows: int | None = None,
) -> DataFrame:
    """Near-duplicate image pairs (id_a, id_b, hamming) within a
    perceptual-hash hamming radius, by radius-sized multi-probe banding
    over the 64-bit phash (see text.simhash_near_dups for the recall
    guarantee, probe cost model, and guard sizing).

    ``max_bucket_size=None`` disables the hot-bucket guard and makes
    recall exactly 1.0 by pigeonhole — the configuration the driver
    gate runs against the all-pairs oracle; keep the auto guard in
    production, where a planted-skew bucket is noise, not signal.
    """
    sig = images.select(
        F.col(id_col), F.col(phash_col).cast("long").alias("simhash")
    )
    return simhash_near_dups(
        sig,
        id_col,
        max_hamming=max_hamming,
        max_bucket_size=max_bucket_size,
        probe_radius=probe_radius,
        n_rows=n_rows,
    )


def phash_dedup_survivors(
    images: DataFrame,
    id_col: str = "image_id",
    phash_col: str = "phash",
    max_hamming: int = 4,
    max_bucket_size: int | str | None = "auto",
) -> DataFrame:
    """Image near-dup SUPPRESSION end-to-end: phash pairs → connected
    components → min-id survivor per cluster → anti-join the corpus
    (the same composition near_dup_survivors runs for text). Victim
    state is an id column only; image bytes never shuffle — the frame
    that flows through the CC rounds holds two id columns per edge."""
    from .graph import connected_components

    pairs = phash_near_dup_images(
        images, id_col, phash_col, max_hamming, max_bucket_size
    )
    cc = connected_components(pairs)
    victims = cc.where(F.col("node") != F.col("cluster_id")).select(
        F.col("node").alias(id_col)
    )
    return images.join(victims, id_col, "left_anti")
