"""End-to-end hygiene contract of the registered warehouse_maintenance
query (plans/warehouse_ops.py): it may pin session state and write
scratch while it runs, but a caller's session and filesystem must come
back exactly as they were — the returned frame is eagerly materialized,
so neither the scratch files nor the UTC pin leak into later actions.
"""

from __future__ import annotations

import glob
import os
import tempfile

SF = "/root/testdata/sf0.001"


def _debris() -> list[str]:
    return glob.glob(os.path.join(tempfile.gettempdir(), "wh_maint_*"))


def test_no_scratch_debris_tz_restored_nonutc_session(spark):
    """Run under a deliberately non-UTC session: the thirty-three audit rows
    must still come back (the query pins UTC internally for its cut
    literals), the session TZ must be restored on return, no
    ``wh_maint_*`` scratch may remain, and the frame must stay
    collectable AFTER the scratch is gone (eager checkpoint contract)."""
    from polygon_daily_market_data_pipeline_spark.plans.warehouse_ops import (
        warehouse_maintenance,
    )

    before_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        df = warehouse_maintenance(spark, SF)
        assert spark.conf.get("spark.sql.session.timeZone") == "America/New_York"
        assert _debris() == []
        rows = {r.check_name: r for r in df.collect()}
        assert len(rows) == 33
        # the union stays collectable repeatedly with the scratch gone
        assert df.count() == 33
        # spot-check two value-bearing rows are populated, not zeroed
        assert rows["scd2_stored"].n_rows == rows["scd2_history"].n_rows
        assert rows["versioned_stream"].n_aux == 1
    finally:
        spark.conf.set("spark.sql.session.timeZone", before_tz)
