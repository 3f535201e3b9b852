"""Library operators (SURVEY.md §4.3) — no custom Catalyst rules needed;
each is a composition of DataFrame algebra that Catalyst can optimize."""

from polygon_daily_market_data_pipeline_spark.operators.dedupe import latest_by_key
from polygon_daily_market_data_pipeline_spark.operators.merge import (
    insert_only_merge,
    merge_upsert,
)

__all__ = ["latest_by_key", "insert_only_merge", "merge_upsert"]
