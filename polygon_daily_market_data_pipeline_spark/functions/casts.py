"""Safe-cast and key-normalization shims (SURVEY.md §2.8 F2–F5, F14).

Mirrors the reference's typed-load projection
(``/root/reference/dags/sql/copy_to_raw.sql:20-25``):
``$2::STRING``, ``TRY_TO_DECIMAL($n,18,6)``, ``TRY_TO_NUMBER($7,38,0)``
— malformed input yields NULL, never an error — and the pervasive
``UPPER(TRIM(SYMBOL))`` key normalization
(``/root/reference/dags/sql/merge_core.sql:9``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def try_to_decimal(col: Column | str, precision: int = 18, scale: int = 6) -> Column:
    """Snowflake ``TRY_TO_DECIMAL(x, p, s)``: NULL on malformed input."""
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast(f"decimal({precision},{scale})")


def try_to_number(col: Column | str, precision: int = 38, scale: int = 0) -> Column:
    """Snowflake ``TRY_TO_NUMBER(x, p, s)``."""
    return try_to_decimal(col, precision, scale)


def norm_key(col: Column | str) -> Column:
    """``UPPER(TRIM(x))`` — the reference normalizes every join/merge key
    this way (merge_core.sql:9, premerge_metrics.sql:13,24,
    merge_dim_security.sql:8)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.upper(F.trim(c))


def safe_divide(num: Column, den: Column, default: float = 0.0) -> Column:
    """DAX ``DIVIDE(a, b, default)`` (dax_measures.md:20): returns
    ``default`` when the denominator is zero or NULL."""
    return F.when(den.isNull() | (den == 0), F.lit(default)).otherwise(num / den)
