"""Targeted deletion from a partitioned parquet warehouse.

The maintenance twin of the keyed MERGE: remove rows (a delisted
symbol, a user's data, a bad batch) without rewriting the table.

- Partition-level predicate (on the partition column): drop the
  matching partition directories — pure metadata, no data job.
- Row-level predicate: rewrite ONLY the partitions that contain
  matching rows (discovered with one pruned aggregation), each as an
  anti-filter rewrite through a temp dir + swap so readers never see a
  half-deleted partition.

At 100 TB the row-level path touches ⌈matching partitions⌉ of data,
never the table — the same partition-scoped-mutation rule as every
other write in this engine.

Downstream contract: any incrementally-maintained aggregate over the
table (``operators/incremental.py``) must be told about a mutated
partition via ``invalidate_partitions(state_dir, [...])`` before its
next refresh — the aggregate's partials are append-only and cannot
subtract a partition's old contribution.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F


def drop_partitions(table_path: str, partition_col: str, values: list[str]) -> int:
    """Remove whole partition dirs (predicate on the partition key) —
    metadata-only delete."""
    dropped = 0
    for v in values:
        p = os.path.join(table_path, f"{partition_col}={v}")
        if os.path.exists(p):
            shutil.rmtree(p)
            dropped += 1
    return dropped


def delete_where(
    spark: SparkSession,
    table_path: str,
    partition_col: str,
    predicate: Column,
) -> int:
    """Delete rows matching ``predicate`` from a hive-partitioned
    parquet table; returns the number of partitions rewritten. Only
    partitions containing matches are touched."""
    df = spark.read.parquet(table_path)
    affected = [
        str(r[0])
        for r in df.where(predicate)
        .select(partition_col)
        .distinct()
        .collect()
    ]
    part_type = dict(df.dtypes)[partition_col]
    rewritten = 0
    for v in affected:
        part_dir = os.path.join(table_path, f"{partition_col}={v}")
        # the partition column lives in the dir name, not the files —
        # reattach it so the predicate can reference it, drop it again
        # before writing (hive layout keeps it out of the data files)
        part_df = spark.read.parquet(part_dir).withColumn(
            partition_col, F.lit(v).cast(part_type)
        )
        kept = part_df.where(~predicate | predicate.isNull()).drop(partition_col)
        if kept.isEmpty():
            shutil.rmtree(part_dir)
            rewritten += 1
            continue
        tmp = os.path.join(table_path, f"_delete_{uuid.uuid4().hex}")
        kept.write.mode("overwrite").parquet(tmp)
        old = part_dir + f"._old_{uuid.uuid4().hex}"
        os.rename(part_dir, old)
        os.rename(tmp, part_dir)
        shutil.rmtree(old)
        rewritten += 1
    return rewritten
