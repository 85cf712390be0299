"""Shared fixtures: one local SparkSession, cached synthetic corpora."""

from __future__ import annotations

import os

import pytest

CORPUS_ROOT = "/tmp/gobulk_spark_test_corpora"


@pytest.fixture(scope="session")
def spark():
    from gobulk_spark.session import get_spark

    s = get_spark("local[8]", app_name="gobulk-tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_1500():
    """1500-row corpus parquet path (seed 42) + matching pandas frames."""
    import pyarrow.parquet as pq

    from gobulk_spark.corpus import ensure_corpus

    d = os.path.join(CORPUS_ROOT, "n1500")
    path = ensure_corpus(d, 1500, seed=42)
    pairs = pq.read_table(path).to_pandas()
    planted = pq.read_table(os.path.join(d, "planted.parquet")).to_pandas()
    return path, pairs, planted


@pytest.fixture(scope="session")
def golden_1500(corpus_1500):
    from gobulk_spark import reference_labeler as rl

    _, pairs, _ = corpus_1500
    return rl.label(pairs)
