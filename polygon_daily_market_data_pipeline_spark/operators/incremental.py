"""Incremental aggregate maintenance — materialized-view refresh
without rescanning history.

The reference's daily cadence recomputes BI aggregates from the full
CORE table every run (Snowflake makes that cheap at 12K rows/day); at
100 TB a full-history groupBy per refresh is the single largest
avoidable scan in a warehouse. For ALGEBRAIC aggregates (sum, count,
min, max — and avg as sum/count at read time) the refresh is
incremental: aggregate ONLY the new partitions, then combine with the
stored aggregate by key. Scan cost is O(new data), not O(history).

Design: the aggregate table lives as parquet next to a JSON watermark
listing processed partitions. A refresh partition-prunes the fact scan
to unprocessed partitions (the pruning is asserted in tests via
``inputFiles``), combines partials via a full-outer key merge (the
same shape as ``merge_upsert``), and swaps the table atomically —
rerunning a crashed refresh is idempotent because the watermark only
advances after the swap.

MIN/MAX caveat: incremental maintenance is append-only. Deletes or
in-place updates to history invalidate min/max (not sum/count-of-adds);
this engine mutates facts only by partition replace (`delete.py`,
`compaction.py`), so the contract is: after replacing a processed
partition, drop it from the watermark and refresh — the combine is
idempotent per partition because partials are per-partition-set.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

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


def partial_aggregate(
    df: DataFrame, group_cols: list[str], measures: dict[str, tuple[str, str]]
) -> DataFrame:
    """One map-side-combinable groupBy producing the partial rows:
    ``measures`` maps output name -> (op, input col), op in
    sum/count/min/max."""
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


def refresh_aggregate(
    spark: SparkSession,
    fact_path: str,
    state_dir: str,
    group_cols: list[str],
    measures: dict[str, tuple[str, str]],
    partition_col: str,
) -> DataFrame:
    """Bring the stored aggregate up to date with the fact table's
    partitions; returns the refreshed aggregate DataFrame. Scans ONLY
    partitions not yet in the watermark."""
    os.makedirs(state_dir, exist_ok=True)
    wm_path = os.path.join(state_dir, "_watermark.json")
    agg_path = os.path.join(state_dir, "agg")
    done: list[str] = []
    if os.path.exists(wm_path):
        with open(wm_path) as f:
            done = json.load(f)["partitions"]

    new = [p for p in list_partitions(fact_path, partition_col) if p not in done]
    if not new:
        return spark.read.parquet(agg_path)

    # basePath keeps the partition column in the schema while the scan
    # reads only the new partition directories — partition pruning by
    # construction, not by filter.
    new_scan = (
        spark.read.option("basePath", fact_path)
        .parquet(*[os.path.join(fact_path, p) for p in new])
    )
    partial = partial_aggregate(new_scan, group_cols, measures)
    if os.path.exists(agg_path):
        combined = combine_aggregates(
            spark.read.parquet(agg_path), partial, group_cols, measures
        )
    else:
        combined = partial

    tmp = os.path.join(state_dir, f"_agg_{uuid.uuid4().hex}")
    combined.write.mode("overwrite").parquet(tmp)
    if os.path.exists(agg_path):
        old = agg_path + "._old"
        os.rename(agg_path, old)
        os.rename(tmp, agg_path)
        shutil.rmtree(old)
    else:
        os.rename(tmp, agg_path)
    with open(wm_path, "w") as f:
        json.dump({"partitions": done + new}, f)
    return spark.read.parquet(agg_path)


def streaming_aggregate_sink(
    group_cols: list[str],
    measures: dict[str, tuple[str, str]],
    state_dir: str,
):
    """foreachBatch sink maintaining a materialized aggregate from a
    stream — the streaming twin of ``refresh_aggregate``: each
    micro-batch contributes an aggregate-sized partial which combines
    into the stored table (never a history rescan). Exactly-once comes
    from the pair (source checkpoint, processed-batch watermark): a
    replayed batch id is skipped, so retries converge.

    Usage::

        q = (events.writeStream
             .foreachBatch(streaming_aggregate_sink(
                 ["event_type"], {"n": ("count", "event_id")}, state_dir))
             .option("checkpointLocation", ckpt).start())
    """
    import shutil
    import uuid

    agg_path = os.path.join(state_dir, "agg")
    wm_path = os.path.join(state_dir, "_batches.json")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        os.makedirs(state_dir, exist_ok=True)
        done: list[int] = []
        if os.path.exists(wm_path):
            with open(wm_path) as f:
                done = json.load(f)["batches"]
        if batch_id in done:
            return  # replay after a crash between commit and checkpoint
        partial = partial_aggregate(batch_df, group_cols, measures)
        spark = batch_df.sparkSession
        if os.path.exists(agg_path):
            combined = combine_aggregates(
                spark.read.parquet(agg_path), partial, group_cols, measures
            )
        else:
            combined = partial
        tmp = os.path.join(state_dir, f"_agg_{uuid.uuid4().hex}")
        combined.write.mode("overwrite").parquet(tmp)
        if os.path.exists(agg_path):
            old = agg_path + "._old"
            os.rename(agg_path, old)
            os.rename(tmp, agg_path)
            shutil.rmtree(old)
        else:
            os.rename(tmp, agg_path)
        with open(wm_path, "w") as f:
            json.dump({"batches": done + [batch_id]}, f)

    return sink
