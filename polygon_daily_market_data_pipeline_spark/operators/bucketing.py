"""Bucketed-table layout: pre-shuffled storage for co-located joins.

The reference's warehouse delegates physical layout to Snowflake; on
Spark, the equivalent lever for repeated large-table equi-joins (fact ⋈
fact, fact ⋈ big-dim at 100 TB) is hash-bucketed storage: both sides
bucketed by the join key into the same bucket count join WITHOUT a
shuffle — the Exchange disappears from the plan entirely (asserted in
tests/test_plans.py). Pay one shuffle at write time, amortized over
every subsequent join/aggregation on that key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` as a parquet table bucketed (and optionally
    bucket-sorted) on the join key. ``n_buckets`` should be sized so a
    bucket fits an executor task (rows/n_buckets ~ one task's worth)
    and kept IDENTICAL across tables meant to co-join."""
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Metastore read — bucketing metadata (`SortMergeJoin` without
    Exchange) only applies via the table identifier, not raw paths."""
    return spark.table(table)
