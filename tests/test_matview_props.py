"""Property-based laws (hypothesis) for the incremental materialized
view: under ARBITRARY short sequences of append / copy-on-write delete
/ keyed-merge update commits, refreshing after every commit leaves the
stored partials row-identical to a from-scratch create at the final
source version — the retraction algebra has no op-order blind spots.
Integer measures throughout, so equality is exact, not toleranced."""

from __future__ import annotations

import itertools
import tempfile

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from polygon_daily_market_data_pipeline_spark.operators.matview import (
    create_matview,
    read_matview,
    refresh_matview,
)
from polygon_daily_market_data_pipeline_spark.operators.versioned import (
    commit_version,
    delete_version_where,
    merge_version,
    read_version,
)

MEASURES = {
    "n": ("count",),
    "total": ("sum", "val"),
    "avg_val": ("avg", "val"),
    "lo": ("min", "val"),
    "hi": ("max", "val"),
}

rows_st = st.lists(
    st.tuples(st.integers(0, 3), st.integers(-5, 5)), min_size=1, max_size=6
)
ops_st = st.lists(
    st.one_of(
        st.tuples(st.just("append"), rows_st),
        st.tuples(st.just("delete"), st.integers(-5, 5)),
        st.tuples(st.just("update"), st.integers(0, 3), st.integers(-6, 6)),
    ),
    min_size=1,
    max_size=3,
)

_ids = itertools.count(1000)


def _frame(spark, rows):
    return spark.createDataFrame(
        [(next(_ids), g, v) for g, v in rows], "k long, g long, val long"
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@settings(max_examples=8, deadline=None)
@given(init=rows_st, ops=ops_st)
def test_refresh_after_every_commit_equals_scratch(spark, init, ops):
    base = tempfile.mkdtemp(prefix="mv_prop_")
    src = f"{base}/src"
    mv = f"{base}/mv"
    commit_version(_frame(spark, init), src)
    create_matview(spark, mv, src, ["g"], MEASURES)
    for op in ops:
        if op[0] == "append":
            commit_version(_frame(spark, op[1]), src, mode="append")
        elif op[0] == "delete":
            delete_version_where(spark, src, F.col("val") <= op[1])
        else:
            _kind, g0, newv = op
            cur = read_version(spark, src).where(F.col("g") == g0)
            upd = cur.withColumn("val", F.lit(newv).cast("long"))
            if upd.limit(1).count():
                merge_version(spark, src, upd, ["k"])
        refresh_matview(spark, mv)
    ref = f"{base}/ref"
    create_matview(spark, ref, src, ["g"], MEASURES)
    got = read_version(spark, mv)
    cols = sorted(got.columns)
    assert _rows(got.select(*cols)) == _rows(
        read_version(spark, ref).select(*cols)
    )
    assert _rows(read_matview(spark, mv)) == _rows(read_matview(spark, ref))
