"""F5 store-config resolution: gobulk preprocessIndices semantics
(output/elasticsearch.go:111-139) — base configs deep-merge under
concrete ones (specific wins), prefix-matched against the SUFFIXED
name, base entries consumed; plus the txlog sink's settings-as-commit-
metadata validation."""

from __future__ import annotations

import os
import shutil

import pytest

from gobulk_spark.storeconfig import deep_merge, resolve_store_configs

BASE = "/tmp/gobulk_spark_test_out/storeconfig"


def test_deep_merge_specific_wins_nested():
    base = {
        "analysis": {"analyzer": "std", "filters": ["lower"]},
        "shards": 4,
        "replicas": 1,
    }
    override = {"analysis": {"analyzer": "custom"}, "shards": 8}
    out = deep_merge(base, override)
    # nested dict merges key-by-key; scalar/list values replace wholesale
    assert out == {
        "analysis": {"analyzer": "custom", "filters": ["lower"]},
        "shards": 8,
        "replicas": 1,
    }
    assert base["analysis"]["analyzer"] == "std"  # inputs not mutated


def test_resolve_store_configs_base_prefix_merge_and_suffix():
    repos = [
        {
            "name": "kept-base",
            "schema": {"props": {"id": "keyword", "ts": "date"}},
            "settings": {"shards": 4, "codec": "best_compression"},
        },
        {
            "name": "kept-images",
            "schema": {"props": {"id": "text"}},
            "settings": {"shards": 8},
        },
        {"name": "audit", "settings": {"shards": 1}},
    ]
    out = resolve_store_configs(repos, suffix="-prod")
    by_name = {r["name"]: r for r in out}
    # base entries are consumed, concrete names suffixed
    assert set(by_name) == {"kept-images-prod", "audit-prod"}
    ki = by_name["kept-images-prod"]
    # specific schema wins per key; base fills the rest
    assert ki["schema"] == {"props": {"id": "text", "ts": "date"}}
    assert ki["settings"] == {"shards": 8, "codec": "best_compression"}
    # no base with prefix 'audit': untouched except the suffix
    assert by_name["audit-prod"]["settings"] == {"shards": 1}


def test_resolve_prefix_matches_suffixed_name():
    """The reference prefix-matches AFTER appending the suffix
    (repo.Name is suffixed first, elasticsearch.go:128-134), so a base
    whose stem only matches the suffixed form still merges."""
    repos = [
        {"name": "kept-v2-base", "settings": {"a": 1}},
        {"name": "kept", "settings": {}},
    ]
    out = resolve_store_configs(repos, suffix="-v2x")
    assert out[0]["name"] == "kept-v2x"
    assert out[0]["settings"] == {"a": 1}  # 'kept-v2x' startswith 'kept-v2'


def test_txlog_sink_validates_settings_as_commit_metadata(spark):
    from gobulk_spark.sinks import SinkSchemaMismatch
    from gobulk_spark.txlog import TxLogKeptSink

    shutil.rmtree(BASE, ignore_errors=True)
    out = os.path.join(BASE, "s")
    settings = resolve_store_configs(
        [
            {"name": "kept-base", "settings": {"retention_versions": 10}},
            {"name": "kept", "settings": {"compression": "zstd"}},
        ]
    )[0]["settings"]
    sink = TxLogKeptSink(out, settings=settings)
    df = spark.createDataFrame(
        [("a", "x", 1)], "image_id string, lang string, v int"
    )
    sink.write(df, "r1")
    ddl = "image_id string, lang string, v int"
    sink.validate(spark, ddl)  # same settings: fine
    assert sink.history(spark)[-1]["settings"] == {
        "retention_versions": 10,
        "compression": "zstd",
    }
    drifted = TxLogKeptSink(out, settings={"compression": "lz4"})
    with pytest.raises(SinkSchemaMismatch, match="settings"):
        drifted.validate(spark, ddl)


def test_resolve_tolerates_null_base_sections():
    """A base config with explicit null schema/settings (JSON
    round-trip shape) merges like an absent one (round-5 review)."""
    out = resolve_store_configs(
        [
            {"name": "logs-base", "schema": None, "settings": {"a": 1}},
            {"name": "logs", "settings": None},
        ]
    )
    assert out[0]["schema"] == {} and out[0]["settings"] == {"a": 1}
