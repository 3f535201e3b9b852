"""Query plans: the analytic suite (driver-contract ``queries()``) and
star-schema builds."""

from polygon_daily_market_data_pipeline_spark.plans.analytics import ORACLES, QUERIES

__all__ = ["ORACLES", "QUERIES"]
