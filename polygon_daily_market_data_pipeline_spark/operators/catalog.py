"""Cross-table snapshot catalog (round 13): consistent multi-table
reads, time travel, and rollback over the WHOLE schema with one
version number.

A single versioned table gives per-table snapshot isolation; an
analytics join over two tables can still tear — read the fact at one
version and its dim at a version a concurrent refresh published
between the two reads. Iceberg's single-table semantics cannot
prevent that; catalogs that version the SET of table pointers (the
Nessie / lakeFS / Project-Nessie posture, and what Snowflake's
database-level Time Travel amounts to) can. This module is that
catalog scoped to the engine's manifest logs: a manifest log OF
manifest logs.

Each catalog version is one JSON file pinning ``{name: (table_dir,
table_version)}`` for every registered table, published with the SAME
fail-if-exists hard-link commit the table manifests use — catalog
history is linear, concurrent publishers race safely (loser retries),
and nothing is ever rewritten. Reads resolve a table name through a
pinned catalog version, so every frame a report derives — however many
tables it joins — comes from ONE consistent instant. O(tables)
metadata at any data size; no Spark jobs.

Scale/ops posture: the catalog file is tables-count-sized; publishing
it does not touch table data or manifests. Rolling the schema back is
publishing a new catalog version with an old version's pins (nothing
moves); auditing "what did the nightly report see" is reading the
catalog version the run logged.
"""

from __future__ import annotations

import json
import os
import re
import uuid

from pyspark.sql import DataFrame, SparkSession

from polygon_daily_market_data_pipeline_spark.operators.versioned import (
    _manifests,
    read_version,
)

_CAT_SUBDIR = "_catalog"


def _cat_dir(catalog_dir: str) -> str:
    return os.path.join(catalog_dir, _CAT_SUBDIR)


def catalog_versions(catalog_dir: str) -> "list[int]":
    d = _cat_dir(catalog_dir)
    if not os.path.isdir(d):
        return []
    out = []
    for f in os.listdir(d):
        m = re.fullmatch(r"(\d+)\.json", f)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def catalog_commit(
    catalog_dir: str,
    tables: dict,
    *,
    expected_version: "int | None" = None,
) -> int:
    """Publish a new catalog version pinning a CONSISTENT table set.
    ``tables`` maps name → ``table_dir`` (pinned at its current latest
    version) or name → ``(table_dir, version)`` (pinned explicitly —
    how a writer that just committed version v publishes exactly v,
    immune to a concurrent later append). Returns the catalog version.

    OCC: with ``expected_version`` the publish fails unless the catalog
    is still at that version; either way the hard-link publish raises
    ``FileExistsError`` if a racing publisher took the number first —
    the loser re-reads and retries, same contract as table commits."""
    if not tables:
        raise ValueError("tables must be non-empty")
    pins = {}
    for name, spec in tables.items():
        if isinstance(spec, (tuple, list)):
            tdir, v = spec
            if v not in _manifests(tdir):
                raise LookupError(f"{name}: version {v} not in {tdir}")
        else:
            tdir = spec
            versions = _manifests(tdir)
            if not versions:
                raise FileNotFoundError(f"{name}: no versions in {tdir}")
            v = versions[-1]
        pins[name] = {"dir": os.path.abspath(tdir), "version": int(v)}
    existing = catalog_versions(catalog_dir)
    if expected_version is not None and (
        not existing or existing[-1] != expected_version
    ):
        raise FileExistsError(
            f"catalog at {existing[-1] if existing else None}, expected "
            f"{expected_version} — re-read and retry"
        )
    new_v = (existing[-1] + 1) if existing else 0
    d = _cat_dir(catalog_dir)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f"_tmp_{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        json.dump({"tables": pins}, f)
    final = os.path.join(d, f"{new_v}.json")
    try:
        os.link(tmp, final)
    except FileExistsError:
        raise FileExistsError(
            f"catalog version {new_v} already committed — concurrent "
            "publisher won; re-read and retry"
        ) from None
    finally:
        os.unlink(tmp)
    return new_v


def catalog_snapshot(
    catalog_dir: str, catalog_version: "int | None" = None
) -> dict:
    """``{name: {"dir", "version"}}`` at the given (default latest)
    catalog version — the audit surface: what any read through this
    catalog version resolves to. Metadata-only."""
    versions = catalog_versions(catalog_dir)
    if not versions:
        raise FileNotFoundError(f"no catalog versions in {catalog_dir}")
    v = versions[-1] if catalog_version is None else catalog_version
    if v not in versions:
        raise LookupError(f"catalog version {v} not in {versions}")
    with open(os.path.join(_cat_dir(catalog_dir), f"{v}.json")) as f:
        return json.load(f)["tables"]


def read_catalog(
    spark: SparkSession,
    catalog_dir: str,
    name: str,
    catalog_version: "int | None" = None,
) -> DataFrame:
    """Read one table THROUGH the catalog: the pinned table version at
    the pinned catalog version. Two reads through the same catalog
    version are mutually consistent no matter what concurrent writers
    publish between them — the torn-join cure."""
    snap = catalog_snapshot(catalog_dir, catalog_version)
    if name not in snap:
        raise LookupError(
            f"table {name!r} not in catalog (has {sorted(snap)})"
        )
    pin = snap[name]
    return read_version(spark, pin["dir"], version=pin["version"])


def catalog_rollback(catalog_dir: str, to_version: int) -> int:
    """Roll the WHOLE schema back: publish a NEW catalog version with
    an old version's pins. History stays linear and append-only;
    nothing in any table moves."""
    snap = catalog_snapshot(catalog_dir, to_version)
    return catalog_commit(
        catalog_dir,
        {n: (p["dir"], p["version"]) for n, p in snap.items()},
    )


def catalog_sql(
    spark: SparkSession,
    catalog_dir: str,
    sql: str,
    catalog_version: "int | None" = None,
    principal: "str | None" = ...,
) -> DataFrame:
    """Run SQL over the catalog's pinned tables: every table in the
    snapshot is registered as a temp view at its pinned version, then
    the statement runs — so a multi-table query is consistent by
    construction, and re-running the same statement at the same catalog
    version is deterministic no matter what writers did since. View
    registration is session-scoped and idempotent (replace).

    ``principal`` routes every view through ``governance.
    read_governed`` — the SQL surface CANNOT bypass a table's masking
    or row-access policies, exactly the Snowflake posture (policies
    bind to the table, not the query path). Pass a principal name
    (``None`` = least privilege: nothing exempt) to get the governed
    views; omit the argument entirely for the legacy raw registration
    (callers owning their own enforcement). Governance is read at
    QUERY time by design: the catalog pins DATA versions, never stale
    access rules."""
    snap = catalog_snapshot(catalog_dir, catalog_version)
    for name, pin in snap.items():
        if principal is ...:
            df = read_version(spark, pin["dir"], version=pin["version"])
        else:
            from polygon_daily_market_data_pipeline_spark.operators.governance import (
                read_governed,
            )

            df = read_governed(
                spark, pin["dir"], principal=principal,
                version=pin["version"],
            )
        df.createOrReplaceTempView(name)
    return spark.sql(sql)
