"""Version-keyed result cache (round 13) — Snowflake's result cache
re-expressed on the manifest log, where "underlying data unchanged" is
a PROVABLE statement instead of a heuristic.

Snowflake returns a stored result when the query matches and its
sources haven't changed; Spark has nothing persistent (``.cache()``
dies with the session). Here a cached result is valid iff every source
table is still at the exact version the result was computed from — one
metadata read per source to decide, zero Spark jobs on a hit beyond
reading the (result-sized) stored table.

Honesty contract: ``compute`` receives READERS PINNED at the versions
the cache records — not "latest" — so the stored result corresponds
exactly to its recorded pins even if a writer appends mid-compute.
Each key's results live in their own versioned table, so cached
results themselves get history/time-travel/vacuum for free; re-running
a changed source just appends the next result version with new pins.
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame, SparkSession

from polygon_daily_market_data_pipeline_spark.operators.versioned import (
    _manifests,
    commit_version,
    read_version,
    write_json_sidecar,
)

_RC_SUBDIR = "_rc"


def _key_dir(cache_dir: str, key: str) -> str:
    return os.path.join(cache_dir, hashlib.md5(key.encode()).hexdigest())


def _rc_path(kdir: str, v: int) -> str:
    return os.path.join(kdir, _RC_SUBDIR, f"v{v}.json")


def cached_result(
    spark: SparkSession,
    cache_dir: str,
    key: str,
    sources: "dict[str, str]",
    compute,
) -> "tuple[DataFrame, dict]":
    """Return ``(result, info)`` for ``compute`` over ``sources``
    (``{name: versioned_table_dir}``), serving a stored result when
    every source is still at its recorded version.

    ``compute(spark, frames)`` receives ``{name: DataFrame}`` — each a
    ``read_version`` PINNED at the version this entry records — and
    returns the result frame. ``info = {"hit": bool, "pins":
    {name: version}, "result_version": int}``. A miss costs the
    compute + one commit of the (result-sized) output; a hit costs the
    sidecar reads + the stored-table read. Stale entries are never
    wrong — they simply stop matching and age out under the key
    table's normal retention/vacuum."""
    pins = {}
    for name, tdir in sorted(sources.items()):
        versions = _manifests(tdir)
        if not versions:
            raise FileNotFoundError(f"{name}: no versions in {tdir}")
        pins[name] = {"dir": os.path.abspath(tdir), "version": versions[-1]}
    kdir = _key_dir(cache_dir, key)
    # identity is (dir, version) per source — version numbers alone
    # collide constantly (every table starts at 0)
    want = {n: (p["dir"], p["version"]) for n, p in pins.items()}
    versions_out = {n: p["version"] for n, p in pins.items()}
    for v in reversed(_manifests(kdir) if os.path.isdir(kdir) else []):
        p = _rc_path(kdir, v)
        if not os.path.exists(p):
            continue  # crash between commit and sidecar: unservable
        with open(p) as f:
            meta = json.load(f)
        if meta["key"] == key and {
            n: (e["dir"], e["version"]) for n, e in meta["pins"].items()
        } == want:
            return read_version(spark, kdir, version=v), {
                "hit": True, "pins": versions_out, "result_version": v,
            }
    frames = {
        n: read_version(spark, p["dir"], version=p["version"])
        for n, p in pins.items()
    }
    result = compute(spark, frames)
    # overwrite: each version IS one result snapshot (older results
    # stay readable via time travel until vacuum)
    v = commit_version(result, kdir, mode="overwrite")
    write_json_sidecar(_rc_path(kdir, v), {"key": key, "pins": pins})
    return read_version(spark, kdir, version=v), {
        "hit": False, "pins": versions_out, "result_version": v,
    }
