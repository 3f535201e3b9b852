"""Window-based deduplication (SURVEY.md §2.5 W1).

Reproduces the reference's QUALIFY dedup — latest ingest wins:

    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY UPPER(TRIM(SYMBOL)), TRADE_DATE
        ORDER BY _INGEST_TS DESC, _SRC_FILE DESC) = 1

(``/root/reference/dags/sql/merge_core.sql:13-16``; same pattern on
``(SECURITY_ID, DATE_SK) ORDER BY LOAD_TS DESC`` in
``merge_facts_daily.sql:16-19``.)

Scale notes: a window over (key) is one hash-partitioned shuffle with
in-partition sort — the minimal plan for top-1-per-key. When the
key count is huge but per-key row counts are tiny (the EOD case:
12K symbols × 1 date), AQE coalescing keeps partition counts sane.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_by_key(
    df: DataFrame,
    keys: Sequence[Column | str],
    order_by: Sequence[Column | str],
) -> DataFrame:
    """Keep exactly one row per key: first row under ``order_by``.

    ``order_by`` columns should already encode the desired direction
    (pass ``F.desc("_ingest_ts")`` etc.). Ties beyond ``order_by`` are
    broken by nothing — supply a total order (the reference always does:
    ``_INGEST_TS DESC, _SRC_FILE DESC``).
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
