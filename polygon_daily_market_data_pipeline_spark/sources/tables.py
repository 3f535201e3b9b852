"""Parquet table loaders for the driver testdata star schema.

Columnar parquet scans are the engine's bread and butter: Catalyst
pushes predicates and prunes columns into the scan
(``PushedFilters`` / ``ReadSchema`` in ``.explain``), which is the
Spark analogue of Snowflake's micro-partition pruning that the
reference leans on (every statement carries a
``WHERE TRADE_DATE = <run date>`` — e.g.
``/root/reference/dags/sql/merge_core.sql:12``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension-sized tables we always broadcast in star joins.
SMALL_DIMS = frozenset({"region", "nation", "supplier", "part", "customer"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame (lazy parquet scan).

    ``events.parquet`` carries TIMESTAMP(NANOS) which vanilla Spark
    rejects (PARQUET_TYPE_ILLEGAL); we read nanos as long
    (``spark.sql.legacy.parquet.nanosAsLong``) and truncate to
    microsecond timestamps — the same truncation DuckDB applies, so
    oracle comparisons agree.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # timestamps are naive; pin the session TZ so hour windows /
        # date_trunc agree with the (naive-UTC) DuckDB oracle even when
        # the harness session defaults to another zone
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = spark.read.parquet(path)
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}
