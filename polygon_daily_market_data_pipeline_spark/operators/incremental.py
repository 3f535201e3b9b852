"""Incremental aggregate maintenance — materialized-view refresh
without rescanning history.

The reference's daily cadence recomputes BI aggregates from the full
CORE table every run (Snowflake makes that cheap at 12K rows/day); at
100 TB a full-history groupBy per refresh is the single largest
avoidable scan in a warehouse. For ALGEBRAIC aggregates (sum, count,
min, max — and avg as sum/count at read time) the refresh is
incremental: aggregate ONLY the new partitions, then combine with the
stored partials by key. Scan cost is O(new data), not O(history).

Design — a manifest log of per-refresh partials:

- Each refresh writes the partial aggregate of the NEW partitions into
  an immutable uuid directory, then atomically publishes a single JSON
  manifest (tmp write + rename — the ``versioned.py`` pattern) listing
  every live partial directory together with the exact partition set it
  covers. The manifest is simultaneously the aggregate pointer AND the
  watermark: a crash between the partial write and the manifest rename
  leaves only an unreferenced directory (debris, cleaned on the next
  publish), never a double-counted partition — rerunning a crashed
  refresh is idempotent by construction.
- The current aggregate is the key-combine of all live partials (an
  aggregate-sized union + groupBy, never a fact scan). Refreshes
  compact the entry list back to one partial once it exceeds
  ``compact_threshold``, bounding read-time combine cost.
- Partition replace/delete is handled by ``invalidate_partitions``:
  because every partial records exactly which partitions it covers,
  dropping the entries that contain a replaced partition removes the
  old contribution EXACTLY (no subtraction needed — subtraction is
  impossible for min/max and sketches). The partitions those entries
  also covered simply become un-covered and are rescanned on the next
  refresh. Compaction widens that rescan (one entry covers everything
  after a compact), which is the documented trade: granularity of
  invalidation vs read-time combine cost.

MIN/MAX caveat: incremental maintenance is append-only per partial.
Deletes or in-place updates to history are ONLY correct through
``invalidate_partitions`` + refresh; mutating a covered partition
without invalidating it corrupts every measure, not just min/max.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# measure -> (spark agg fn over new rows, combine fn between partials)
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),  # counts combine by summing
    "min": (F.min, F.min),
    "max": (F.max, F.max),
    # COUNT(DISTINCT) is not algebraic — a distinct count of parts does
    # not combine. The mergeable form is the Datasketches HLL sketch:
    # partials hold the binary sketch, refreshes union sketches, and
    # readers estimate with hll_sketch_estimate(col). ~2% error at the
    # default lgConfigK=12, constant bytes per group per refresh.
    "ndv_sketch": (F.hll_sketch_agg, F.hll_union_agg),
}

_MANIFEST = "_manifest.json"
DEFAULT_COMPACT_THRESHOLD = 8
# how long a compacted-away/invalidated partial dir stays on disk for
# held readers before GC — see _retire_and_publish
DEFAULT_RETIRE_GRACE_S = 600.0


def histogram_measures(
    col: str, lo: float, hi: float, nb: int = 32, prefix: str = "hist"
) -> dict:
    """Mergeable fixed-boundary histogram as ``nb`` count measures —
    the incremental form of percentile/median tracking, the way
    ``ndv_sketch`` is the incremental form of COUNT(DISTINCT). Exact
    percentiles are not algebraic (they don't combine across refreshes);
    bucket counts over FIXED boundaries are: each refresh adds the new
    partitions' counts, and any quantile reads off the cumulative
    histogram with ≤ one-bucket-width error. Values outside [lo, hi)
    clamp into the edge buckets so totals stay conserved. Returns a
    measures fragment to merge into a ``refresh_aggregate`` /
    ``streaming_aggregate_sink`` measures dict; read quantiles with
    ``percentile_from_histogram``."""
    if nb < 2:
        raise ValueError("need at least 2 buckets")
    width = (float(hi) - float(lo)) / nb
    if width <= 0:
        raise ValueError("hi must be > lo")
    c = F.col(col)
    out: dict = {}
    for i in range(nb):
        b_lo, b_hi = lo + i * width, lo + (i + 1) * width
        cond = (c >= b_lo) & (c < b_hi)
        if i == 0:
            cond = c < b_hi  # clamp underflow
        if i == nb - 1:
            cond = c >= b_lo  # clamp overflow
        # count of a when-expression counts its non-null rows — reuses
        # the existing algebraic 'count' (combines by summing)
        out[f"{prefix}_{i}"] = ("count", F.when(cond & c.isNotNull(), 1))
    return out


def percentile_from_histogram(
    q: float, lo: float, hi: float, nb: int = 32, prefix: str = "hist"
):
    """Column expression estimating the q-quantile (0..1) from the
    ``histogram_measures`` bucket-count columns via linear
    interpolation inside the covering bucket — pure codegen arithmetic
    over the (tiny) aggregate row, error ≤ one bucket width."""
    width = (float(hi) - float(lo)) / nb
    counts = [F.col(f"{prefix}_{i}") for i in range(nb)]
    total = counts[0]
    for c in counts[1:]:
        total = total + c
    target = F.lit(q) * total.cast("double")
    expr = F.lit(float(hi))  # fallback: everything below target
    cum = F.lit(0).cast("double")
    # build from the first bucket up, nesting WHENs so the FIRST bucket
    # whose cumulative count reaches the target wins
    branches = []
    for i in range(nb):
        prev_cum = cum
        cum = cum + counts[i].cast("double")
        frac = F.when(
            counts[i] > 0, (target - prev_cum) / counts[i].cast("double")
        ).otherwise(F.lit(0.0))
        est = F.lit(lo + i * width) + frac * F.lit(width)
        branches.append((cum >= target, est))
    for cond, est in reversed(branches):
        expr = F.when(cond, est).otherwise(expr)
    return expr


def partial_aggregate(
    df: DataFrame, group_cols: list[str], measures: dict[str, tuple[str, str]]
) -> DataFrame:
    """One map-side-combinable groupBy producing the partial rows:
    ``measures`` maps output name -> (op, input col), op in
    sum/count/min/max/ndv_sketch."""
    aggs = []
    for name, (op, col) in measures.items():
        if op not in _ALGEBRAIC:
            raise ValueError(f"non-algebraic op {op!r} (have {sorted(_ALGEBRAIC)})")
        aggs.append(_ALGEBRAIC[op][0](col).alias(name))
    return df.groupBy(*group_cols).agg(*aggs)


def combine_aggregates(
    existing: DataFrame,
    partial: DataFrame,
    group_cols: list[str],
    measures: dict[str, tuple[str, str]],
) -> DataFrame:
    """Key-merge two partial-aggregate frames: one shuffle on the group
    key (both sides are aggregate-sized, not fact-sized)."""
    union = existing.select(partial.columns).unionByName(partial)
    aggs = [
        _ALGEBRAIC[op][1](name).alias(name)
        for name, (op, _col) in measures.items()
    ]
    return union.groupBy(*group_cols).agg(*aggs)


def list_partitions(fact_path: str, partition_col: str) -> list[str]:
    return sorted(
        e
        for e in os.listdir(fact_path)
        if e.startswith(f"{partition_col}=") and not e.startswith(("_", "."))
    )


# --- manifest log -----------------------------------------------------------


def _load_manifest(state_dir: str) -> dict:
    path = os.path.join(state_dir, _MANIFEST)
    if not os.path.exists(path):
        return {"entries": []}
    with open(path) as f:
        return json.load(f)


def _publish_manifest(state_dir: str, manifest: dict) -> None:
    """Atomic single-file commit: the rename makes the new partial set
    (and therefore the new watermark) visible in one step. Single-writer
    contract, same as ``versioned.commit_version``."""
    tmp = os.path.join(state_dir, f"_tmp_{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.rename(tmp, os.path.join(state_dir, _MANIFEST))


def _retire_and_publish(
    state_dir: str,
    prev_manifest: dict,
    manifest: dict,
    grace_s: float,
) -> None:
    """Publish + GC with time-graced retirement: dirs live in the
    previous manifest but not the new one enter ``retired`` (a dir →
    retirement-time map; held readers may still scan them) and are
    reclaimed at the first LATER publish once they have been retired
    for more than ``grace_s`` seconds. The grace is time-based, not
    publish-count-based, because publishes can be arbitrarily close
    together — the documented ``invalidate_partitions`` →
    ``refresh_aggregate`` sequence is two publishes seconds apart, and
    a count-of-one rule would reclaim the invalidated dirs under a
    reader obtained just before the pair ran."""
    import time

    now = time.time()
    prev_live = {e["dir"] for e in prev_manifest["entries"]}
    new_live = {e["dir"] for e in manifest["entries"]}
    prev_retired = prev_manifest.get("retired", {})
    if isinstance(prev_retired, list):  # pre-grace manifest form
        prev_retired = {d: 0.0 for d in prev_retired}
    retired = {
        d: ts
        for d, ts in prev_retired.items()
        if now - ts <= grace_s and d not in new_live
    }
    retired.update({d: now for d in prev_live - new_live})
    manifest["retired"] = retired
    _publish_manifest(state_dir, manifest)
    _gc_unreferenced(state_dir, manifest)


def _gc_unreferenced(state_dir: str, manifest: dict) -> None:
    """Best-effort removal of partial dirs neither live nor RETIRED in
    this manifest. A lazy frame returned by ``read_aggregate`` keeps
    referencing the partial dirs it was built from, so deleting a
    compacted-away dir at publish time would break any held reader
    mid-scan (FileNotFoundException, or silent row loss under
    ignoreMissingFiles) — see ``_retire_and_publish`` for the grace
    rule that decides when a dir leaves ``retired``."""
    keep = {e["dir"] for e in manifest["entries"]} | set(
        manifest.get("retired", {})
    )
    for d in os.listdir(state_dir):
        if d.startswith("partial-") and d not in keep:
            shutil.rmtree(os.path.join(state_dir, d), ignore_errors=True)


def covered_partitions(state_dir: str) -> list[str]:
    """The watermark: every fact partition whose contribution is in a
    live partial."""
    out: set[str] = set()
    for e in _load_manifest(state_dir)["entries"]:
        out.update(e.get("partitions", []))
    return sorted(out)


def covered_batches(state_dir: str) -> set[int]:
    """Streaming watermark: every micro-batch id in a live partial."""
    out: set[int] = set()
    for e in _load_manifest(state_dir)["entries"]:
        out.update(e.get("batches", []))
    return out


def _combine_entries(
    spark: SparkSession,
    state_dir: str,
    entries: list[dict],
    group_cols: list[str],
    measures: dict[str, tuple[str, str]],
) -> DataFrame:
    """Key-combine the listed partial dirs into one aggregate frame."""
    frames = [
        spark.read.parquet(os.path.join(state_dir, e["dir"])) for e in entries
    ]
    agg = frames[0]
    for f in frames[1:]:
        agg = combine_aggregates(agg, f, group_cols, measures)
    return agg


def read_aggregate(
    spark: SparkSession,
    state_dir: str,
    group_cols: list[str],
    measures: dict[str, tuple[str, str]],
) -> DataFrame:
    """The current aggregate: key-combine of all live partials (0 or 1
    aggregate-sized shuffles — never a fact scan)."""
    entries = _load_manifest(state_dir)["entries"]
    if not entries:
        raise FileNotFoundError(f"no aggregate committed in {state_dir}")
    return _combine_entries(spark, state_dir, entries, group_cols, measures)


def _append_partial(
    state_dir: str,
    partial: DataFrame,
    cover: dict,
    group_cols: list[str],
    measures: dict[str, tuple[str, str]],
    compact_threshold: int,
    retire_grace_s: float,
) -> None:
    """Write one partial dir, optionally compact, then publish the
    manifest — the publish commits partial + watermark together."""
    spark = partial.sparkSession
    prev = _load_manifest(state_dir)
    part_dir = f"partial-{uuid.uuid4().hex}"
    partial.write.mode("errorifexists").parquet(os.path.join(state_dir, part_dir))
    entries = prev["entries"] + [{"dir": part_dir, **cover}]

    if len(entries) > compact_threshold:
        # fold every live partial into one: aggregate-sized work, and
        # the compacted entry's cover is the union of its inputs'
        agg = _combine_entries(spark, state_dir, entries, group_cols, measures)
        compact_dir = f"partial-{uuid.uuid4().hex}"
        agg.write.mode("errorifexists").parquet(
            os.path.join(state_dir, compact_dir)
        )
        merged: dict = {"dir": compact_dir}
        for key in ("partitions", "batches"):
            vals = [e[key] for e in entries if key in e]
            if vals:
                merged[key] = sorted({v for lst in vals for v in lst})
        entries = [merged]

    _retire_and_publish(
        state_dir, prev, {**prev, "entries": entries}, retire_grace_s
    )


def refresh_aggregate(
    spark: SparkSession,
    fact_path: str,
    state_dir: str,
    group_cols: list[str],
    measures: dict[str, tuple[str, str]],
    partition_col: str,
    compact_threshold: int = DEFAULT_COMPACT_THRESHOLD,
    retire_grace_s: float = DEFAULT_RETIRE_GRACE_S,
) -> DataFrame:
    """Bring the stored aggregate up to date with the fact table's
    partitions; returns the refreshed aggregate DataFrame. Scans ONLY
    partitions not yet covered by a live partial; the partial and the
    watermark commit together in one manifest rename (crash-idempotent
    — see module docstring)."""
    os.makedirs(state_dir, exist_ok=True)
    done = set(covered_partitions(state_dir))
    new = [p for p in list_partitions(fact_path, partition_col) if p not in done]
    if new:
        # basePath keeps the partition column in the schema while the
        # scan reads only the new partition directories — partition
        # pruning by construction, not by filter.
        new_scan = (
            spark.read.option("basePath", fact_path)
            .parquet(*[os.path.join(fact_path, p) for p in new])
        )
        partial = partial_aggregate(new_scan, group_cols, measures)
        _append_partial(
            state_dir,
            partial,
            {"partitions": new},
            group_cols,
            measures,
            compact_threshold,
            retire_grace_s,
        )
    return read_aggregate(spark, state_dir, group_cols, measures)


def invalidate_partitions(
    state_dir: str,
    partitions: Iterable[str],
    retire_grace_s: float = DEFAULT_RETIRE_GRACE_S,
) -> list[str]:
    """Partition replace/delete support: drop every live partial whose
    cover intersects ``partitions``. Because a partial's contribution is
    exactly its recorded partition set, dropping the entry removes the
    old data's contribution EXACTLY — no subtraction, so this is correct
    for min/max and sketches, not just sums. Returns the partitions that
    lost coverage (they will be rescanned by the next refresh)."""
    targets = set(partitions)
    os.makedirs(state_dir, exist_ok=True)  # no-op before the first refresh
    prev = _load_manifest(state_dir)
    keep, dropped_cover = [], set()
    for e in prev["entries"]:
        if targets & set(e.get("partitions", [])):
            dropped_cover.update(e.get("partitions", []))
        else:
            keep.append(e)
    _retire_and_publish(
        state_dir, prev, {**prev, "entries": keep}, retire_grace_s
    )
    return sorted(dropped_cover)


def streaming_aggregate_sink(
    group_cols: list[str],
    measures: dict[str, tuple[str, str]],
    state_dir: str,
    compact_threshold: int = DEFAULT_COMPACT_THRESHOLD,
    retire_grace_s: float = DEFAULT_RETIRE_GRACE_S,
):
    """foreachBatch sink maintaining a materialized aggregate from a
    stream — the streaming twin of ``refresh_aggregate``: each
    micro-batch contributes an aggregate-sized partial which joins the
    manifest log (never a history rescan). Exactly-once comes from the
    pair (source checkpoint, manifest batch watermark): the partial and
    the processed-batch id commit in ONE manifest rename, so a crash at
    any point either fully includes the batch or leaves debris that the
    replay overwrites — a replayed batch id already in the manifest is
    skipped.

    Usage::

        q = (events.writeStream
             .foreachBatch(streaming_aggregate_sink(
                 ["event_type"], {"n": ("count", "event_id")}, state_dir))
             .option("checkpointLocation", ckpt).start())

    Read the current view with ``read_aggregate(spark, state_dir, ...)``.
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        os.makedirs(state_dir, exist_ok=True)
        if batch_id in covered_batches(state_dir):
            return  # replay after a crash between commit and checkpoint
        partial = partial_aggregate(batch_df, group_cols, measures)
        _append_partial(
            state_dir,
            partial,
            {"batches": [batch_id]},
            group_cols,
            measures,
            compact_threshold,
            retire_grace_s,
        )

    return sink
