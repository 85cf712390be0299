"""Mirror of the driver's correctness gate: every queries() entry runs,
and each oracle_sql() entry matches DuckDB on the same parquet tables
(row count + order-insensitive values)."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entrymod

SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def test_entry_smoke(spark):
    out = entrymod.entry(spark)
    rows = out.collect()
    assert len(rows) >= 0 and len(out.schema) > 0


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_runs_and_matches_oracle(spark, duck, name):
    q = entrymod.queries()[name]
    sdf = q(spark, SF_DIR).toPandas()
    oracle = entrymod.oracle_sql().get(name)
    if oracle is None:
        assert len(sdf) >= 0  # rows-only check, like the driver's
        return
    ddf = duck.execute(oracle).df()
    assert len(sdf) == len(ddf), f"{name}: rows {len(sdf)} vs oracle {len(ddf)}"
    assert sorted(sdf.columns) == sorted(ddf.columns), (
        f"{name}: columns {sorted(sdf.columns)} vs {sorted(ddf.columns)}"
    )
    a, b = _canon(sdf), _canon(ddf)
    for c in a.columns:
        av, bv = a[c], b[c]
        # the driver's value hash is dtype-FAMILY-sensitive: DuckDB
        # sum(int)->HUGEINT materializes as float64 and hash-fails against
        # a Spark BIGINT even when values match (r01: max_token_freq,
        # sessionization, event_type_pivot), while int32-vs-int64 passes
        # (r01: minhash band). Gate on the family, not the width.
        fam = {"i": "i", "u": "i"}
        ak, bk = fam.get(av.dtype.kind, av.dtype.kind), fam.get(bv.dtype.kind, bv.dtype.kind)
        assert ak == bk, f"{name}.{c}: dtype {av.dtype} vs oracle {bv.dtype}"
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            bad = ~(
                (av.isna() & bv.isna())
                | (abs(av.astype(float) - bv.astype(float)) <= 1e-9)
            )
        else:
            bad = av.astype(str) != bv.astype(str)
        assert not bad.any(), f"{name}.{c}: {a.loc[bad.fillna(True)].head(5)}\nvs\n{b.loc[bad.fillna(True)].head(5)}"


def test_rows_only_queries_nonempty(spark):
    """The unverifiable operators should still produce plausible output."""
    qs = entrymod.queries()
    assert len(qs["flagship_quality_filter"](spark, SF_DIR).collect()) > 0
    fams = qs["embedding_ann_families"](spark, SF_DIR).toPandas()
    assert set(fams["family"]) == {"lsh_bucket", "ivf", "pq", "ivfpq"}
    assert len(fams) > 0


def test_oracle_checked_entries_precede_rows_only():
    """The driver records exactly the first 50 queries() entries
    (round-4 CORRECTNESS silently dropped entries 51-54). Pin the two
    invariants that keep every gate driver-visible: total <= 50, and
    every oracle-checked entry sorts before the rows-only tail."""
    qs = list(entrymod.queries())
    oracles = entrymod.oracle_sql()
    assert len(qs) <= 50, f"{len(qs)} entries — driver checks only 50"
    seen_rows_only = False
    for name in qs:
        if name not in oracles:
            seen_rows_only = True
        else:
            assert not seen_rows_only, (
                f"oracle-checked {name!r} sorts after a rows-only entry"
            )
