"""Incremental materialized views over versioned tables (round 13).

The reference delegates materialized aggregates wholesale — Snowflake
keeps its MVs fresh, Power BI re-imports its cache (SURVEY.md §4.1);
Spark itself has nothing: a ``CREATE TABLE AS`` is stale the moment the
source moves. This module keeps a grouped-aggregate table EXACTLY in
sync with a versioned source by retraction algebra over the source's
own change feed, the Materialize/Snowflake-MV posture re-expressed on
this manifest log:

- ``create_matview`` — one full aggregate at a PINNED source version;
  the MV is itself a versioned table (every refresh is a commit, so the
  view's states get time travel / history / rollback for free), with a
  sidecar recording ``(source_dir, source_version, group_cols,
  measures)``.
- ``refresh_matview`` — reads ONLY the delta between the recorded and
  the current source version. When every intervening commit is an
  APPEND, the delta is ``read_changes`` — O(new rows), zero old-data
  IO, the daily-load fast path. When a commit REDEFINED rows (MERGE /
  DELETE / overwrite / rollback), the delta is ``diff_versions``' bag
  diff — which reads only the directory symmetric difference, O(changed
  data), never O(table). Inserts add, deletes retract:

  * COUNT / SUM / AVG are retraction-EXACT — pure integer/decimal
    arithmetic per group, no rescan, ever. (Float sums retract with
    float rounding; the exactness laws in tests/test_matview.py are
    stated on integer and decimal measures, same discipline as the
    warehouse audit surface.)
  * MIN / MAX are retraction-blind (deleting the minimum says nothing
    about the runner-up), so groups that LOST rows are rescanned — one
    pass over the source at the new version, semi-joined to the dirty
    group set (broadcast, so only dirty-group rows shuffle), skipped
    entirely when no measure is min/max or no group lost rows.
  * a group whose live row count reaches zero leaves the MV; a SUM
    whose non-null support reaches zero surfaces NULL again (the
    hidden per-measure non-null count makes 0-vs-NULL exact, the
    classic incremental-view pitfall).

- ``read_matview`` — the user-facing frame: AVG surfaced as its exact
  sum/count pair's quotient, hidden bookkeeping columns dropped.

Scale shape at 100 TB: the MV is group-count-sized; an append refresh
reads the appended files only; a mutation refresh reads the mutated
commits' directories; the min/max rescan is the one full source pass
and it is paid only on delete-touched groups — the refresh that never
needs it (append-only feeds, or sum/count views) never scans history.
Refreshes are idempotent and replayable: the sidecar pins which source
version each MV version represents, and a refresh at an unchanged
source is a metadata-only no-op.
"""

from __future__ import annotations

import functools
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from polygon_daily_market_data_pipeline_spark.operators.versioned import (
    _load_manifest,
    _manifests,
    commit_version,
    diff_versions,
    read_changes,
    read_version,
    write_json_sidecar,
)

_MV_SUBDIR = "_mv"
_N = "__mv_n__"  # live row count per group (liveness + count(*))

_KINDS = ("count", "sum", "avg", "min", "max")


def _mv_path(mv_dir: str, v: int) -> str:
    return os.path.join(mv_dir, _MV_SUBDIR, f"v{v}.json")


def _write_mv_sidecar(mv_dir: str, v: int, meta: dict) -> None:
    write_json_sidecar(_mv_path(mv_dir, v), meta)


def _load_mv_sidecar(mv_dir: str) -> "tuple[int, dict]":
    """(mv_version, meta) from the NEWEST sidecar at or before the MV's
    latest version. A missing sidecar for the latest version (crash
    between commit and sidecar publish) falls back to the previous one:
    the spec is immutable and a refresh from an older recorded source
    version only re-reads more delta — never wrong."""
    versions = _manifests(mv_dir)
    if not versions:
        raise FileNotFoundError(f"no versions in {mv_dir}")
    for v in reversed(versions):
        p = _mv_path(mv_dir, v)
        if os.path.exists(p):
            with open(p) as f:
                return v, json.load(f)
    raise FileNotFoundError(
        f"no matview sidecar in {mv_dir} — not a create_matview table"
    )


def _norm_measures(measures: dict) -> "dict[str, tuple[str, str | None]]":
    out = {}
    for name, spec in measures.items():
        if isinstance(spec, str):
            kind, col = spec, None
        else:
            kind, col = (spec[0], spec[1] if len(spec) > 1 else None)
        kind = kind.lower()
        if kind not in _KINDS:
            raise ValueError(f"measure {name!r}: unknown kind {kind!r}")
        if kind != "count" and col is None:
            raise ValueError(f"measure {name!r}: {kind} needs a column")
        if name.startswith("__mv_"):
            raise ValueError(f"measure {name!r}: __mv_ prefix is reserved")
        out[name] = (kind, col)
    return out


def _storage_cols(measures: dict) -> "list[str]":
    """Ordered storage columns after the group keys."""
    cols = [_N]
    for name, (kind, _col) in measures.items():
        if kind == "count":
            cols.append(name)
        elif kind == "sum":
            cols += [name, f"__mv_nn_{name}"]
        elif kind == "avg":
            cols += [f"__mv_sum_{name}", f"__mv_cnt_{name}"]
        else:  # min / max
            cols.append(name)
    return cols


def _full_aggregate(df: DataFrame, group_cols, measures) -> DataFrame:
    aggs = [F.count(F.lit(1)).cast("long").alias(_N)]
    for name, (kind, col) in measures.items():
        if kind == "count":
            # count(col): non-null rows; bare count: count(*)
            aggs.append(
                (F.count(col) if col else F.count(F.lit(1)))
                .cast("long").alias(name)
            )
        elif kind == "sum":
            aggs += [
                F.sum(col).alias(name),
                F.count(col).cast("long").alias(f"__mv_nn_{name}"),
            ]
        elif kind == "avg":
            aggs += [
                F.sum(col).alias(f"__mv_sum_{name}"),
                F.count(col).cast("long").alias(f"__mv_cnt_{name}"),
            ]
        elif kind == "min":
            aggs.append(F.min(col).alias(name))
        else:
            aggs.append(F.max(col).alias(name))
    return df.groupBy(*group_cols).agg(*aggs)


def create_matview(
    spark: SparkSession,
    mv_dir: str,
    source_dir: str,
    group_cols: "list[str]",
    measures: dict,
    source_version: "int | None" = None,
    where_sql: "str | None" = None,
) -> int:
    """Materialize ``SELECT group_cols, <measures> FROM source [WHERE
    where_sql] GROUP BY group_cols`` at a pinned source version.
    ``measures`` maps output column name → ``(kind, col)`` with kind in
    count/sum/avg/min/max (``("count",)`` or ``"count"`` for
    COUNT(*)). Returns the MV's version. One aggregation pass over the
    source — the only full pass the view's lifetime needs unless a
    delete dirties a min/max.

    ``where_sql`` (round 13) makes the view FILTERED — the Snowflake-MV
    shape ``...WHERE pred GROUP BY...``: the predicate (a SQL boolean
    over source columns, stored in the sidecar) restricts every path
    the refresh takes — full aggregate, append delta, bag-diff delta,
    and the min/max rescan — so rows outside it can never perturb the
    view. Retraction stays exact because a row's pred-membership is a
    pure function of its values: an insert and its retraction land on
    the same side of the filter by construction."""
    group_cols = list(group_cols)
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    norm = _norm_measures(measures)
    if source_version is None:
        versions = _manifests(source_dir)
        if not versions:
            raise FileNotFoundError(f"no versions in {source_dir}")
        source_version = versions[-1]
    src = read_version(spark, source_dir, version=source_version)
    if where_sql:
        src = src.where(where_sql)
    partial = _full_aggregate(src, group_cols, norm).select(
        *group_cols, *_storage_cols(norm)
    )
    v = commit_version(partial, mv_dir, mode="overwrite")
    _write_mv_sidecar(
        mv_dir,
        v,
        {
            "source_dir": source_dir,
            "source_version": source_version,
            "group_cols": group_cols,
            "measures": {k: list(t) for k, t in norm.items()},
            **({"where_sql": where_sql} if where_sql else {}),
        },
    )
    return v


def _nullsafe_cond(left: DataFrame, right: DataFrame, cols: "list[str]"):
    return functools.reduce(
        lambda a, b: a & b, [left[c].eqNullSafe(right[c]) for c in cols]
    )


def refresh_matview(
    spark: SparkSession,
    mv_dir: str,
    source_dir: "str | None" = None,
) -> dict:
    """Bring the MV up to the source's latest version by reading only
    the delta. Returns ``{"mode": "noop" | "append" | "diff",
    "from_version", "to_version", "mv_version", "rescanned": bool}``.
    ``mode="noop"`` (source unchanged) is METADATA-ONLY — zero Spark
    jobs, no new MV version. ``rescanned`` reports whether the min/max
    dirty-group rescan ran (diff mode with deletes touching a min/max
    view only)."""
    mv_v, meta = _load_mv_sidecar(mv_dir)
    src_dir = source_dir or meta["source_dir"]
    group_cols = meta["group_cols"]
    norm = {k: tuple(v) for k, v in meta["measures"].items()}
    s0 = meta["source_version"]
    versions = _manifests(src_dir)
    if not versions:
        raise FileNotFoundError(f"no versions in {src_dir}")
    s1 = versions[-1]
    if s1 == s0:
        return {
            "mode": "noop",
            "from_version": s0,
            "to_version": s1,
            "mv_version": mv_v,
            "rescanned": False,
        }
    storage = _storage_cols(norm)
    old = read_version(spark, mv_dir, version=mv_v)

    try:
        delta = read_changes(spark, src_dir, s0, to_version=s1)
        if meta.get("where_sql"):
            delta = delta.where(meta["where_sql"])
        mode = "append"
    except ValueError:
        delta = None
        mode = "diff"

    rescanned = False
    if mode == "append":
        # inserts only: every aggregate merges monotonically
        delta_partial = _full_aggregate(delta, group_cols, norm).select(
            *group_cols, *storage
        )
        combined = _combine(
            old.select(*group_cols, *storage), delta_partial, group_cols, norm
        )
    else:
        d = diff_versions(spark, src_dir, s0, to_version=s1)
        if meta.get("where_sql"):
            # pred-membership is a value function: filtering the bag
            # diff is exactly filtering both versions before diffing
            d = d.where(meta["where_sql"])
        sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
            F.lit(-1)
        )
        n = F.col("_n")
        aggs = [F.sum(sign * n).cast("long").alias(_N)]
        for name, (kind, col) in norm.items():
            nonnull = F.when(F.col(col).isNotNull(), 1).otherwise(0) if col \
                else None
            if kind == "count":
                aggs.append(
                    F.sum(sign * n * (nonnull if col is not None else F.lit(1)))
                    .cast("long").alias(name)
                )
            elif kind == "sum":
                aggs += [
                    F.sum(sign * n * F.col(col)).alias(name),
                    F.sum(sign * n * nonnull).cast("long")
                    .alias(f"__mv_nn_{name}"),
                ]
            elif kind == "avg":
                aggs += [
                    F.sum(sign * n * F.col(col)).alias(f"__mv_sum_{name}"),
                    F.sum(sign * n * nonnull).cast("long")
                    .alias(f"__mv_cnt_{name}"),
                ]
            elif kind == "min":
                aggs.append(
                    F.min(
                        F.when(F.col("_change_type") == "insert", F.col(col))
                    ).alias(name)
                )
            else:
                aggs.append(
                    F.max(
                        F.when(F.col("_change_type") == "insert", F.col(col))
                    ).alias(name)
                )
        aggs.append(
            F.max(
                F.when(F.col("_change_type") == "delete", 1).otherwise(0)
            ).alias("__mv_dirty__")
        )
        delta_partial = d.groupBy(*group_cols).agg(*aggs)
        old_sel = old.select(*group_cols, *storage)
        minmax_cols = [
            name for name, (kind, _c) in norm.items() if kind in ("min", "max")
        ]
        if minmax_cols:
            dirty = (
                delta_partial.where(F.col("__mv_dirty__") == 1)
                .select(*group_cols)
            )
            # retraction cannot reconstruct a lost extreme: null the old
            # min/max for delete-touched groups, then let the rescan
            # partials below (plus any surviving insert partials) refill
            # them through the same MIN/MAX combine
            dirty_tagged = dirty.select(
                *[F.col(c).alias(f"__mv_g_{c}") for c in group_cols]
            ).withColumn("__mv_dirty__", F.lit(1))
            marked = old_sel.join(
                F.broadcast(dirty_tagged),
                functools.reduce(
                    lambda a, b: a & b,
                    [
                        old_sel[c].eqNullSafe(F.col(f"__mv_g_{c}"))
                        for c in group_cols
                    ],
                ),
                "left",
            )
            old_sel = marked.select(
                *group_cols,
                *[
                    (
                        F.when(F.col("__mv_dirty__").isNull(), F.col(c))
                        .otherwise(F.lit(None)).alias(c)
                        if c in minmax_cols
                        else F.col(c)
                    )
                    for c in storage
                ],
            )
            # rescan ONLY dirty groups at the new source version: the
            # semi join broadcasts the (delta-sized) dirty set, so the
            # pass shuffles dirty-group rows, not the table
            src_now = read_version(spark, src_dir, version=s1)
            if meta.get("where_sql"):
                src_now = src_now.where(meta["where_sql"])
            bdirty2 = F.broadcast(dirty)
            dirty_rows = src_now.join(
                bdirty2, _nullsafe_cond(src_now, bdirty2, group_cols),
                "left_semi",
            )
            rescan_aggs = []
            for name, (kind, col) in norm.items():
                if kind == "min":
                    rescan_aggs.append(F.min(col).alias(name))
                elif kind == "max":
                    rescan_aggs.append(F.max(col).alias(name))
            rescan = dirty_rows.groupBy(*group_cols).agg(*rescan_aggs)
            # rescan partials contribute ONLY min/max (zero to every
            # additive column) — n/sums stay retraction-exact
            zero = []
            for c in storage:
                if c in minmax_cols:
                    zero.append(F.col(c))
                elif c == _N or c.startswith(("__mv_nn_", "__mv_cnt_")):
                    zero.append(F.lit(0).cast("long").alias(c))
                else:
                    zero.append(F.lit(None).alias(c))
            rescan_partial = rescan.select(*group_cols, *zero)
            rescanned = True
            delta_sel = delta_partial.select(*group_cols, *storage)
            combined = _combine(
                _combine(old_sel, delta_sel, group_cols, norm),
                rescan_partial,
                group_cols,
                norm,
            )
        else:
            combined = _combine(
                old_sel,
                delta_partial.select(*group_cols, *storage),
                group_cols,
                norm,
            )

    new_mv = commit_version(
        combined.select(*group_cols, *storage), mv_dir, mode="overwrite"
    )
    _write_mv_sidecar(
        mv_dir,
        new_mv,
        {**meta, "source_dir": src_dir, "source_version": s1},
    )
    return {
        "mode": mode,
        "from_version": s0,
        "to_version": s1,
        "mv_version": new_mv,
        "rescanned": rescanned,
    }


def _combine(a: DataFrame, b: DataFrame, group_cols, norm) -> DataFrame:
    """Merge two partial frames of identical storage schema: additive
    columns SUM, min/max columns MIN/MAX, then liveness + NULL
    canonicalization (a dead group leaves; a sum with zero non-null
    support is NULL, not 0)."""
    u = a.unionByName(b)
    aggs = [F.sum(_N).cast("long").alias(_N)]
    for name, (kind, _col) in norm.items():
        if kind == "count":
            aggs.append(F.sum(name).cast("long").alias(name))
        elif kind == "sum":
            aggs += [
                F.sum(name).alias(name),
                F.sum(f"__mv_nn_{name}").cast("long")
                .alias(f"__mv_nn_{name}"),
            ]
        elif kind == "avg":
            aggs += [
                F.sum(f"__mv_sum_{name}").alias(f"__mv_sum_{name}"),
                F.sum(f"__mv_cnt_{name}").cast("long")
                .alias(f"__mv_cnt_{name}"),
            ]
        elif kind == "min":
            aggs.append(F.min(name).alias(name))
        else:
            aggs.append(F.max(name).alias(name))
    out = u.groupBy(*group_cols).agg(*aggs).where(F.col(_N) > 0)
    for name, (kind, _col) in norm.items():
        if kind == "sum":
            out = out.withColumn(
                name,
                F.when(
                    F.col(f"__mv_nn_{name}") > 0, F.col(name)
                ).otherwise(F.lit(None)),
            )
    return out


def read_matview(
    spark: SparkSession, mv_dir: str, version: "int | None" = None
) -> DataFrame:
    """The user-facing view frame: group columns + measures in spec
    order, AVG surfaced as its exact sum/count quotient, bookkeeping
    columns hidden."""
    _v, meta = _load_mv_sidecar(mv_dir)
    df = read_version(spark, mv_dir, version=version)
    cols = [F.col(c) for c in meta["group_cols"]]
    for name, spec in meta["measures"].items():
        kind = spec[0]
        if kind == "avg":
            cols.append(
                F.when(
                    F.col(f"__mv_cnt_{name}") > 0,
                    F.col(f"__mv_sum_{name}") / F.col(f"__mv_cnt_{name}"),
                ).alias(name)
            )
        else:
            cols.append(F.col(name))
    return df.select(*cols)


def matview_source_version(mv_dir: str) -> int:
    """Which source version the MV currently represents — the pinned
    freshness contract, metadata-only."""
    _v, meta = _load_mv_sidecar(mv_dir)
    return meta["source_version"]


def matview_stream_sink(
    source_dir: str,
    mv_dir: str,
    *,
    stats_cols: "list[str] | None" = None,
    **sink_kwargs,
):
    """Streaming MV maintenance: a ``foreachBatch`` sink composing
    exactly-once versioned ingest (``versioned_stream_sink`` — replays
    dedup on the batch watermark) with an incremental refresh that
    brings the view to the source's new head. Every micro-batch is an
    APPEND, so the refresh always takes the O(new-rows) change-feed
    path — the streaming loop never rescans, and the MV's commit
    history IS the stream's aggregate history (time travel over the
    view's past states).

    Crash anywhere and the replay completes only the missing half:
    a replayed batch id skips the ingest (watermark) and the refresh
    no-ops if the MV already represents the source's latest version —
    double idempotence, pinned by test. The MV must exist
    (``create_matview`` over the source before starting the query)."""
    from polygon_daily_market_data_pipeline_spark.operators.versioned import (
        versioned_stream_sink,
    )

    ingest = versioned_stream_sink(
        source_dir, stats_cols=stats_cols, **sink_kwargs
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        ingest(batch_df, batch_id)
        refresh_matview(batch_df.sparkSession, mv_dir)

    return sink


def rollup_matview(
    spark: SparkSession,
    mv_dir: str,
    to_group_cols: "list[str]",
    version: "int | None" = None,
) -> DataFrame:
    """Answer a COARSER aggregate from the view's stored partials — the
    aggregate-navigator rewrite (Snowflake's MV query rewrite, BI
    cubes' rollup): an MV grouped by (a, b) answers any GROUP BY over a
    subset of its keys without touching the source, because every
    measure kind re-aggregates losslessly from partials — counts and
    sums ADD (their non-null supports add with them, so 0-vs-NULL
    stays exact), AVG re-divides the added sum/count pair, MIN/MAX
    take MIN/MAX. ``to_group_cols ⊆ group_cols`` is validated; an
    empty list is the grand total (constant-keyed single group).
    Cost: one group-count-sized aggregation — source size never
    appears."""
    _v, meta = _load_mv_sidecar(mv_dir)
    group_cols = meta["group_cols"]
    bad = [c for c in to_group_cols if c not in group_cols]
    if bad:
        raise ValueError(
            f"cannot roll up to {bad} — not in the view's group keys "
            f"{group_cols}"
        )
    norm = {k: tuple(v) for k, v in meta["measures"].items()}
    df = read_version(spark, mv_dir, version=version)
    aggs = [F.sum(_N).cast("long").alias(_N)]
    for name, (kind, _col) in norm.items():
        if kind == "count":
            aggs.append(F.sum(name).cast("long").alias(name))
        elif kind == "sum":
            aggs += [
                F.sum(name).alias(name),
                F.sum(f"__mv_nn_{name}").cast("long")
                .alias(f"__mv_nn_{name}"),
            ]
        elif kind == "avg":
            aggs += [
                F.sum(f"__mv_sum_{name}").alias(f"__mv_sum_{name}"),
                F.sum(f"__mv_cnt_{name}").cast("long")
                .alias(f"__mv_cnt_{name}"),
            ]
        elif kind == "min":
            aggs.append(F.min(name).alias(name))
        else:
            aggs.append(F.max(name).alias(name))
    if to_group_cols:
        rolled = df.groupBy(*to_group_cols).agg(*aggs)
    else:
        rolled = df.agg(*aggs)
    cols = []
    for c in to_group_cols:
        cols.append(F.col(c))
    for name, (kind, _col) in norm.items():
        if kind == "avg":
            cols.append(
                F.when(
                    F.col(f"__mv_cnt_{name}") > 0,
                    F.col(f"__mv_sum_{name}") / F.col(f"__mv_cnt_{name}"),
                ).alias(name)
            )
        elif kind == "sum":
            cols.append(
                F.when(
                    F.col(f"__mv_nn_{name}") > 0, F.col(name)
                ).otherwise(F.lit(None)).alias(name)
            )
        else:
            cols.append(F.col(name))
    return rolled.select(*cols)
