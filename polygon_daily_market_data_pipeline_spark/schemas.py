"""Layer schemas for the market-data warehouse (SURVEY.md §1.2, FIXTURES.md).

Fixed, explicitly-declared schemas — nothing inferred, mirroring the
reference's COPY INTO column-list contract
(``/root/reference/dags/sql/copy_to_raw.sql:6-28``).
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    DateType,
    DecimalType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

PRICE = DecimalType(18, 6)  # TRY_TO_DECIMAL($n,18,6) — copy_to_raw.sql:21-24
VOLUME = DecimalType(38, 0)  # TRY_TO_NUMBER($7,38,0) — copy_to_raw.sql:25

# Landing CSV column order: eod_data_downloader.py:153
LANDING_CSV_COLUMNS = [
    "trade_date",
    "symbol",
    "open",
    "high",
    "low",
    "close",
    "volume",
]

# All-string read schema for the landing CSV; typed casts happen in the
# load projection (try_cast ⇒ NULL on malformed, like TRY_TO_*).
LANDING_CSV_SCHEMA = StructType(
    [StructField(c, StringType(), True) for c in LANDING_CSV_COLUMNS]
)

RAW_EOD_PRICES = StructType(
    [
        StructField("trade_date", DateType(), False),
        StructField("symbol", StringType(), True),
        StructField("open", PRICE, True),
        StructField("high", PRICE, True),
        StructField("low", PRICE, True),
        StructField("close", PRICE, True),
        StructField("volume", VOLUME, True),
        StructField("_src_file", StringType(), True),  # METADATA$FILENAME
        StructField("_ingest_ts", TimestampType(), True),
    ]
)

CORE_EOD_PRICES = StructType(
    [
        StructField("trade_date", DateType(), False),
        StructField("symbol", StringType(), False),  # normalized
        StructField("open", PRICE, True),
        StructField("high", PRICE, True),
        StructField("low", PRICE, True),
        StructField("close", PRICE, True),
        StructField("volume", VOLUME, True),
        StructField("load_ts", TimestampType(), True),
    ]
)

DIM_SECURITY = StructType(
    [
        StructField("security_id", LongType(), False),
        StructField("symbol", StringType(), False),
    ]
)

DIM_DATE = StructType(
    [
        StructField("date_sk", IntegerType(), False),
        StructField("cal_date", DateType(), False),
        StructField("year_num", IntegerType(), False),
        StructField("quarter_num", IntegerType(), False),
        StructField("month_num", IntegerType(), False),
        StructField("month_name", StringType(), False),
        StructField("day_num", IntegerType(), False),
        StructField("day_name", StringType(), False),
        StructField("day_of_week", IntegerType(), False),
        StructField("week_of_year", IntegerType(), False),
        StructField("is_weekend", BooleanType(), False),
    ]
)

FACT_DAILY_PRICE = StructType(
    [
        StructField("security_id", LongType(), False),
        StructField("date_sk", IntegerType(), False),
        StructField("trade_date", DateType(), False),
        StructField("open", PRICE, True),
        StructField("high", PRICE, True),
        StructField("low", PRICE, True),
        StructField("close", PRICE, True),
        StructField("volume", VOLUME, True),
        StructField("load_ts", TimestampType(), True),
    ]
)
