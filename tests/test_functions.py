"""Unit tests: calendar shims (F7–F12), safe casts (F3/F4), safe divide
(F14) — the highest semantic-divergence-risk expressions (SURVEY §7.3.2)."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

from pyspark.sql import Row
from pyspark.sql import functions as F

from polygon_daily_market_data_pipeline_spark.functions.calendar import calendar_attributes
from polygon_daily_market_data_pipeline_spark.functions.casts import (
    norm_key,
    safe_divide,
    try_to_decimal,
)


def test_calendar_attributes_snowflake_semantics(spark):
    # Sunday 2024-01-07, Saturday 2024-01-06, Monday 2024-01-01
    df = spark.createDataFrame(
        [(dt.date(2024, 1, 7),), (dt.date(2024, 1, 6),), (dt.date(2024, 1, 1),)],
        "d date",
    )
    attrs = calendar_attributes(F.col("d"))
    rows = {
        r["cal_date"]: r
        for r in df.select(
            *[e.alias(n) for n, e in attrs.items()]
        ).collect()
    }
    sun = rows[dt.date(2024, 1, 7)]
    sat = rows[dt.date(2024, 1, 6)]
    mon = rows[dt.date(2024, 1, 1)]
    # DAYOFWEEK 0=Sunday…6=Saturday (Snowflake base, merge_dim_date.sql:16)
    assert sun["day_of_week"] == 0 and sat["day_of_week"] == 6
    assert mon["day_of_week"] == 1
    assert sun["is_weekend"] and sat["is_weekend"] and not mon["is_weekend"]
    # 3-letter abbreviations (MONTHNAME/DAYNAME)
    assert sun["day_name"] == "Sun" and mon["day_name"] == "Mon"
    assert sun["month_name"] == "Jan"
    assert mon["date_sk"] == 20240101
    assert mon["week_of_year"] == 1  # ISO: 2024-01-01 is a Monday, week 1
    assert (mon["year_num"], mon["quarter_num"], mon["month_num"], mon["day_num"]) == (
        2024, 1, 1, 1,
    )


def test_try_to_decimal_null_on_malformed(spark):
    df = spark.createDataFrame(
        [("1.5",), ("not_a_number",), (None,), ("2e3",)], "x string"
    )
    out = [r[0] for r in df.select(try_to_decimal("x").alias("v")).collect()]
    assert out[0] == Decimal("1.500000")
    assert out[1] is None and out[2] is None
    assert out[3] == Decimal("2000.000000")  # scientific notation parses


def test_norm_key_and_safe_divide(spark):
    df = spark.createDataFrame([Row(s="  aapl ", a=1.0, b=0.0), Row(s="X", a=4.0, b=2.0)])
    rows = df.select(
        norm_key("s").alias("k"),
        safe_divide(F.col("a"), F.col("b")).alias("d"),
    ).collect()
    assert rows[0]["k"] == "AAPL" and rows[0]["d"] == 0.0  # DIVIDE(...,0)
    assert rows[1]["k"] == "X" and rows[1]["d"] == 2.0


def test_asof_join_semantics(spark):
    import datetime as dt

    from polygon_daily_market_data_pipeline_spark.operators.asof import asof_join

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    left = spark.createDataFrame(
        [(1, t(5), "l1"), (1, t(10), "l2"), (1, t(2), "l0"), (2, t(7), "l3")],
        "k long, ts timestamp, lv string",
    )
    right = spark.createDataFrame(
        [(1, t(3), 30.0), (1, t(10), 100.0), (2, t(9), 90.0)],
        "k long, ts timestamp, rv double",
    )
    got = {
        (r.k, r.ts.minute, r.rv_asof)
        for r in asof_join(left, right, on="ts", by=["k"]).collect()
    }
    assert got == {
        (1, 2, None),     # no view at or before 00:02
        (1, 5, 30.0),     # latest at-or-before is 00:03
        (1, 10, 100.0),   # equal timestamps match (inclusive)
        (2, 7, None),     # right row exists only later
    }
