"""Streaming ingest of the EOD landing zone.

Batch shape (reference): one CSV per trading day lands in S3
(``/root/reference/dags/get_securities_data.py:13,16``), then Snowflake
``COPY INTO`` appends typed rows to RAW (``dags/sql/copy_to_raw.sql``)
and ``MERGE`` upserts CORE (``dags/sql/merge_core.sql``).

Streaming shape (here):

- ``stream_landing_to_raw`` — ``readStream`` over the landing dir with
  the declared CSV schema (never inferred), the same typed projection as
  the batch path, and a parquet **file sink**: its ``_spark_metadata``
  commit log + the source checkpoint give exactly-once per input file —
  the streaming analog of the reference's skip-if-exists upload +
  ``FORCE=TRUE`` idempotent re-load.
- ``stream_landing_to_core`` — ``foreachBatch`` upsert into CORE using
  the same keyed-merge operator as batch; MERGE is not a streaming sink,
  so per-micro-batch batch-merge is the idiomatic Spark pattern. Replays
  converge because the merge is keyed (SYMBOL, TRADE_DATE).

Both default to ``Trigger.AvailableNow``: drain everything present, then
stop — a scheduled daily invocation behaves exactly like the cron batch,
while the same code run with a processing-time trigger is a continuous
ingest. At 100 TB the file source lists incrementally (maxFilesPerTrigger
bounds a micro-batch) and the sink appends date-partitioned parquet, so
no stage ever holds more than one micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from polygon_daily_market_data_pipeline_spark.schemas import LANDING_CSV_SCHEMA
from polygon_daily_market_data_pipeline_spark.sources.csv_landing import _null_if
from polygon_daily_market_data_pipeline_spark.functions.casts import (
    try_to_decimal,
    try_to_number,
)


def read_landing_stream(
    spark: SparkSession, landing_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming scan of the landing CSVs (schema declared, PERMISSIVE —
    malformed fields go NULL like ON_ERROR='CONTINUE')."""
    reader = (
        spark.readStream.schema(LANDING_CSV_SCHEMA)
        .options(header=True, mode="PERMISSIVE")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.csv(landing_dir)


def typed_projection(df: DataFrame) -> DataFrame:
    """The COPY INTO projection (copy_to_raw.sql:19-27) on a stream:
    trade_date comes from the file's own column (the batch path injects
    it as a Jinja literal; a multi-day stream must carry it per row)."""
    return df.select(
        F.to_date(_null_if(F.col("trade_date"))).alias("trade_date"),
        _null_if(F.col("symbol")).alias("symbol"),
        try_to_decimal(_null_if(F.col("open"))).alias("open"),
        try_to_decimal(_null_if(F.col("high"))).alias("high"),
        try_to_decimal(_null_if(F.col("low"))).alias("low"),
        try_to_decimal(_null_if(F.col("close"))).alias("close"),
        try_to_number(_null_if(F.col("volume"))).alias("volume"),
        F.col("_metadata.file_path").alias("_src_file"),
        F.current_timestamp().alias("_ingest_ts"),
    ).where(F.col("trade_date").isNotNull())


def stream_landing_to_raw(
    spark: SparkSession,
    landing_dir: str,
    raw_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Landing CSVs → RAW parquet, exactly-once, date-partitioned."""
    typed = typed_projection(read_landing_stream(spark, landing_dir))
    writer = (
        typed.writeStream.format("parquet")
        .option("path", raw_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("trade_date")
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_landing_to_core(
    spark: SparkSession,
    landing_dir: str,
    core_merge,  # Callable[[DataFrame], None]: keyed upsert of one batch
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Landing CSVs → CORE via per-micro-batch keyed merge
    (``foreachBatch``) — the streaming MERGE INTO pattern."""
    typed = typed_projection(read_landing_stream(spark, landing_dir))

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        core_merge(batch_df)

    writer = (
        typed.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
