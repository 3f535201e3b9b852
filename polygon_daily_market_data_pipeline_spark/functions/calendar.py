"""Calendar-semantics shims (SURVEY.md §2.8 F7–F12, §4.3.3).

The reference's date dimension (``/root/reference/dags/sql/
merge_dim_date.sql:8-18``) uses Snowflake calendar semantics, which
diverge from Spark's:

- ``DAYOFWEEK``: Snowflake default is 0=Sunday…6=Saturday; Spark's
  ``dayofweek`` is 1=Sunday…7=Saturday → shim subtracts 1.
- ``MONTHNAME`` / ``DAYNAME``: Snowflake returns 3-letter abbreviations
  ("Jan", "Mon") → ``date_format`` with ``MMM`` / ``EEE``.
- ``WEEK``: ISO-like week of year → ``weekofyear``.

All expressions are Catalyst-native (constant-foldable, codegen'd).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def date_sk(col: Column | str) -> Column:
    """Snowflake ``TO_NUMBER(TO_CHAR(d,'YYYYMMDD'))``
    (merge_dim_date.sql:8, merge_facts_daily.sql:14)."""
    return F.date_format(_c(col), "yyyyMMdd").cast("int")


def day_of_week_0(col: Column | str) -> Column:
    """Snowflake ``DAYOFWEEK``: 0=Sunday … 6=Saturday
    (merge_dim_date.sql:16)."""
    return (F.dayofweek(_c(col)) - F.lit(1)).cast("int")


def is_weekend(col: Column | str) -> Column:
    """``DAYOFWEEK(d) IN (0, 6)`` (merge_dim_date.sql:18)."""
    return day_of_week_0(col).isin(0, 6)


def month_abbrev(col: Column | str) -> Column:
    """Snowflake ``MONTHNAME`` → 'Jan'..'Dec' (merge_dim_date.sql:13)."""
    return F.date_format(_c(col), "MMM")


def day_abbrev(col: Column | str) -> Column:
    """Snowflake ``DAYNAME`` → 'Sun'..'Sat' (merge_dim_date.sql:15)."""
    return F.date_format(_c(col), "EEE")


def week_of_year(col: Column | str) -> Column:
    """Snowflake ``WEEK`` (ISO week) (merge_dim_date.sql:17)."""
    return F.weekofyear(_c(col)).cast("int")


def calendar_attributes(d: Column | str) -> dict[str, Column]:
    """The 11 derived calendar attributes of the reference date dim
    (merge_dim_date.sql:8-18), keyed by output column name."""
    c = _c(d)
    return {
        "date_sk": date_sk(c),
        "cal_date": c.cast("date"),
        "year_num": F.year(c).cast("int"),
        "quarter_num": F.quarter(c).cast("int"),
        "month_num": F.month(c).cast("int"),
        "month_name": month_abbrev(c),
        "day_num": F.dayofmonth(c).cast("int"),
        "day_name": day_abbrev(c),
        "day_of_week": day_of_week_0(c),
        "week_of_year": week_of_year(c),
        "is_weekend": is_weekend(c),
    }
