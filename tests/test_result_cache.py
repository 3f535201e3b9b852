"""Version-keyed result cache (operators/result_cache.py): hit serves
the stored result without recomputing, any source moving invalidates,
distinct keys don't collide, and compute sees PINNED readers."""

from __future__ import annotations

from pyspark.sql import functions as F

from polygon_daily_market_data_pipeline_spark.operators.result_cache import (
    cached_result,
)
from polygon_daily_market_data_pipeline_spark.operators.versioned import (
    commit_version,
)


def _sources(spark, tmp_path):
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    commit_version(
        spark.createDataFrame([(1, 10), (2, 20)], "k long, v long"), a
    )
    commit_version(
        spark.createDataFrame([(1, "x"), (2, "y")], "k long, s string"), b
    )
    return a, b


def test_hit_miss_and_invalidation(spark, tmp_path):
    a, b = _sources(spark, tmp_path)
    cache = str(tmp_path / "cache")
    calls = []

    def compute(sp, frames):
        calls.append(1)
        return (
            frames["a"].join(frames["b"], "k")
            .agg(F.sum("v").cast("long").alias("total"))
        )

    r1, i1 = cached_result(spark, cache, "q1", {"a": a, "b": b}, compute)
    assert not i1["hit"] and r1.first()["total"] == 30 and len(calls) == 1
    r2, i2 = cached_result(spark, cache, "q1", {"a": a, "b": b}, compute)
    assert i2["hit"] and r2.first()["total"] == 30 and len(calls) == 1
    # a source moves: the entry stops matching, compute runs again
    commit_version(
        spark.createDataFrame([(3, 30)], "k long, v long"), a, mode="append"
    )
    commit_version(
        spark.createDataFrame([(3, "z")], "k long, s string"), b, mode="append"
    )
    r3, i3 = cached_result(spark, cache, "q1", {"a": a, "b": b}, compute)
    assert not i3["hit"] and r3.first()["total"] == 60 and len(calls) == 2
    # back to a hit at the new pins
    _r4, i4 = cached_result(spark, cache, "q1", {"a": a, "b": b}, compute)
    assert i4["hit"] and len(calls) == 2


def test_distinct_keys_do_not_collide(spark, tmp_path):
    a, b = _sources(spark, tmp_path)
    cache = str(tmp_path / "cache")
    r1, _ = cached_result(
        spark, cache, "sum", {"a": a},
        lambda sp, f: f["a"].agg(F.sum("v").cast("long").alias("x")),
    )
    r2, _ = cached_result(
        spark, cache, "count", {"a": a},
        lambda sp, f: f["a"].agg(F.count(F.lit(1)).cast("long").alias("x")),
    )
    assert r1.first()["x"] == 30 and r2.first()["x"] == 2
    # both now hit independently
    _, i1 = cached_result(spark, cache, "sum", {"a": a},
                          lambda sp, f: None)
    _, i2 = cached_result(spark, cache, "count", {"a": a},
                          lambda sp, f: None)
    assert i1["hit"] and i2["hit"]


def test_compute_sees_pinned_readers(spark, tmp_path):
    """compute's frames are pinned at the recorded versions — a writer
    appending between resolve and compute cannot leak into the stored
    result (the result must equal its pins)."""
    a, _b = _sources(spark, tmp_path)
    cache = str(tmp_path / "cache")

    def compute(sp, frames):
        # simulate the concurrent append landing mid-compute
        commit_version(
            sp.createDataFrame([(99, 990)], "k long, v long"),
            a, mode="append",
        )
        return frames["a"].agg(F.sum("v").cast("long").alias("x"))

    r, info = cached_result(spark, cache, "q", {"a": a}, compute)
    assert r.first()["x"] == 30  # the pinned state, not the appended one
    # next call: source moved, so it recomputes over the new pin
    r2, i2 = cached_result(
        spark, cache, "q", {"a": a},
        lambda sp, f: f["a"].agg(F.sum("v").cast("long").alias("x")),
    )
    assert not i2["hit"] and r2.first()["x"] == 1020


def test_same_key_different_source_dirs_never_collide(spark, tmp_path):
    """Version numbers start at 0 for every table, so matching on
    versions alone would serve table A's result for table B — identity
    must be (dir, version)."""
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    commit_version(spark.createDataFrame([(1, 10)], "k long, v long"), a)
    commit_version(spark.createDataFrame([(1, 999)], "k long, v long"), b)
    cache = str(tmp_path / "cache")

    def total(sp, frames):
        return frames["t"].agg(F.sum("v").cast("long").alias("x"))

    r1, i1 = cached_result(spark, cache, "q", {"t": a}, total)
    assert not i1["hit"] and r1.first()["x"] == 10
    # same key, same version number (0), DIFFERENT table: must miss
    r2, i2 = cached_result(spark, cache, "q", {"t": b}, total)
    assert not i2["hit"] and r2.first()["x"] == 999
    # and each now hits independently
    assert cached_result(spark, cache, "q", {"t": a}, total)[1]["hit"]
    assert cached_result(spark, cache, "q", {"t": b}, total)[1]["hit"]
