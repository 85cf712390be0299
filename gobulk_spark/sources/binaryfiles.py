"""Directory-of-files source (gobulk Input.Read / S3Input analogue).

gobulk's S4 operator reads raw bytes per container from a repository of
objects (input.go:22, input/s3.go:157-198); its S3 ModifyScan hook
(input/s3.go:38-46) lets the user filter the listing. Spark's
``binaryFile`` source covers both: each file becomes a row with path,
length, modificationTime and content, and the filter predicate is pushed
into the file index (partition pruning on path, length filters evaluated
before content is read).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def read_binary_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    modify_scan: Callable[[DataFrame], DataFrame] | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Scan a directory of opaque files into (image_id, bytes, source_file).

    - glob: pathGlobFilter pushed to the file listing (ModifyScan on
      names, evaluated before any read);
    - max_bytes: length predicate — binaryFile supports pushdown on the
      ``length`` column, so oversized blobs are never fetched;
    - modify_scan: arbitrary user DataFrame->DataFrame hook over the
      listing columns (the gobulk ModifyScan extension point).
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if max_bytes is not None:
        df = df.where(F.col("length") <= max_bytes)
    if modify_scan is not None:
        df = modify_scan(df)
    return df.select(
        # the id is the scheme-stripped PATH — gobulk's container key is
        # the full identifier (buildContainerKey = join(repo, identifier),
        # utils.go:19-21) precisely because a friendly basename silently
        # collides (a/x.png vs b/x.png, x.png vs x.jpg) and a collision
        # corrupts every id-keyed tier: classify marks one an update of
        # the other and the marker's latest-hash-per-id flaps forever
        F.regexp_replace(F.col("path"), r"^[A-Za-z][A-Za-z0-9+.\-]*:/+", "").alias(
            "image_id"
        ),
        # the basename-minus-extension, for callers that want a display
        # name and KNOW their layout makes it unique
        F.regexp_extract(F.col("path"), r"([^/]+?)(\.[A-Za-z0-9]+)?$", 1).alias(
            "file_stem"
        ),
        F.col("content").alias("bytes"),
        F.col("path").alias("source_file"),
        F.col("length"),
        F.col("modificationTime").alias("last_modified"),
    )
