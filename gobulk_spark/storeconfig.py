"""Store-configuration resolution — gobulk's F5 index-merge semantics.

gobulk's Elasticsearch output preprocesses its repository (index)
configurations before creating anything (output/elasticsearch.go:
111-139, `preprocessIndices`): a repository named ``<X>-base`` is a
BASE configuration, never created itself; every concrete repository
whose name starts with ``X`` gets the base's schema and settings
deep-merged underneath its own (the specific repository's values win),
and an environment suffix is appended to each concrete name.

This was the one SURVEY §2 row previously declared out of scope as a
config concern. The transaction-log sink gives it a real home: the
resolved settings become commit metadata of the store (the analogue of
the ES index settings attached at index creation), validated on every
later run the same way the schema is.

Pure functions, no I/O — the merge itself is the contract.
"""

from __future__ import annotations

from typing import Any


def deep_merge(base: dict, override: dict) -> dict:
    """Recursive dict merge, ``override`` wins on conflicts; nested
    dicts merge key-by-key, any non-dict value replaces wholesale
    (the merge.Merge(base, specific) call shape of
    output/elasticsearch.go:132-133). Inputs are not mutated."""
    out: dict[str, Any] = dict(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def resolve_store_configs(
    repositories: list[dict], suffix: str = ""
) -> list[dict]:
    """gobulk ``preprocessIndices``: split base vs concrete configs by
    the ``-base`` name suffix, deep-merge every matching base (name
    prefix match against the SUFFIXED concrete name, as the reference
    does) under each concrete repository's ``schema`` and ``settings``,
    and append ``suffix`` to concrete names. Base entries are consumed,
    never returned.

    Each repository is a dict with ``name`` (str) and optional
    ``schema`` / ``settings`` dicts.
    """
    bases: dict[str, dict] = {}
    concrete: list[dict] = []
    for repo in repositories:
        stem = repo["name"].removesuffix("-base")
        if stem != repo["name"]:
            bases[stem] = repo
        else:
            concrete.append(repo)
    resolved = []
    for repo in concrete:
        out = dict(repo)
        out["name"] = f"{repo['name']}{suffix}"
        for prefix, base in bases.items():
            if out["name"].startswith(prefix):
                # `or {}` on BOTH sides: a JSON round-trip leaves
                # explicit nulls, and a base with "schema": null must
                # merge like an absent one, not crash the merge
                out["schema"] = deep_merge(
                    base.get("schema") or {}, out.get("schema") or {}
                )
                out["settings"] = deep_merge(
                    base.get("settings") or {}, out.get("settings") or {}
                )
        resolved.append(out)
    return resolved
