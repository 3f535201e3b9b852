"""Partition compaction — the small-files countermeasure.

A date-partitioned warehouse written by many tasks (or by streaming
micro-batches) accretes small files; at 100 TB the scan cost becomes
dominated by file-open overhead and the NameNode/listing pressure is
real. Compaction rewrites a partition into ⌈bytes / target⌉ files.

Design: size is measured from the filesystem (no data scan), the
rewrite is one coalesce-write of just that partition (partition-scoped
like every other mutation in this engine), and the write goes through a
temp dir + atomic-ish rename so a crashed compaction never leaves a
half-partition visible. Rows are layout-moved, never changed, so
incrementally-maintained aggregates over the table stay valid — unlike
``delete.py`` mutations, which require ``invalidate_partitions``.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import SparkSession

TARGET_FILE_BYTES = 128 * 1024 * 1024


def partition_size_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def data_file_count(path: str) -> int:
    n = 0
    for root, _dirs, files in os.walk(path):
        n += sum(1 for f in files if not f.startswith(("_", ".")))
    return n


def compact_partition(
    spark: SparkSession,
    table_path: str,
    partition_dir: str,
    target_file_bytes: int = TARGET_FILE_BYTES,
    min_files: int = 2,
) -> bool:
    """Compact one partition dir (e.g. ``trade_date=2024-01-05``) of a
    parquet table. Returns True if a rewrite happened. No-op when the
    partition already has fewer than ``min_files`` data files or fits
    one target file."""
    src = os.path.join(table_path, partition_dir)
    n_files = data_file_count(src)
    size = partition_size_bytes(src)
    want = max(1, (size + target_file_bytes - 1) // target_file_bytes)
    if n_files < min_files or n_files <= want:
        return False

    df = spark.read.parquet(src)
    tmp = os.path.join(table_path, f"_compact_{uuid.uuid4().hex}")
    df.coalesce(int(want)).write.mode("overwrite").parquet(tmp)
    old = src + f"._old_{uuid.uuid4().hex}"
    os.rename(src, old)
    os.rename(tmp, src)
    shutil.rmtree(old)
    return True


def compact_table(
    spark: SparkSession,
    table_path: str,
    partition_col: str,
    target_file_bytes: int = TARGET_FILE_BYTES,
) -> int:
    """Compact every partition of a hive-layout parquet table; returns
    the number of partitions rewritten."""
    done = 0
    for entry in sorted(os.listdir(table_path)):
        if entry.startswith(f"{partition_col}="):
            if compact_partition(
                spark, table_path, entry, target_file_bytes=target_file_bytes
            ):
                done += 1
    return done
