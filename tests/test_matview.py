"""Incremental materialized views (operators/matview.py, round 13):
the exactness laws. The governing contract — stated on integer and
decimal measures, where retraction arithmetic is exact — is that after
ANY commit sequence the incrementally-refreshed MV's STORED partials
are row-identical to a from-scratch ``create_matview`` at the same
source version; plus the liveness/NULL edges (dead groups leave, a sum
with zero non-null support surfaces NULL, not 0), the min/max
dirty-group rescan, the no-op fast path, and the crash-tolerant
sidecar fallback."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from polygon_daily_market_data_pipeline_spark.operators.matview import (
    create_matview,
    matview_source_version,
    read_matview,
    refresh_matview,
)
from polygon_daily_market_data_pipeline_spark.operators.versioned import (
    _manifests,
    commit_version,
    delete_version_where,
    merge_version,
    read_version,
)

MEASURES = {
    "n": ("count",),
    "n_val": ("count", "val"),
    "total": ("sum", "val"),
    "money": ("sum", "price"),
    "avg_val": ("avg", "val"),
    "lo": ("min", "val"),
    "hi": ("max", "val"),
}


def _src(spark, n=400, tag=0):
    return (
        spark.range(n)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 7).alias("g"),
            F.when(F.col("id") % 11 == 3, F.lit(None).cast("long"))
            .otherwise(F.col("id") * 3 + tag).alias("val"),
            (F.col("id").cast("decimal(12,2)") * F.lit("0.25"))
            .cast("decimal(12,2)").alias("price"),
        )
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _assert_equals_full(spark, mv_dir, src_dir, tmp_path, name):
    """THE law: stored partials after incremental refreshes ==
    create_matview from scratch at the same source version."""
    ref_dir = str(tmp_path / f"ref_{name}")
    create_matview(spark, ref_dir, src_dir, ["g"], MEASURES)
    got = read_version(spark, mv_dir)
    want = read_version(spark, ref_dir)
    assert sorted(got.columns) == sorted(want.columns)
    assert _rows(got.select(*sorted(got.columns))) == _rows(
        want.select(*sorted(want.columns))
    )
    # and the SURFACED view agrees too (avg division included)
    assert _rows(read_matview(spark, mv_dir)) == _rows(
        read_matview(spark, ref_dir)
    )


def test_append_refresh_equals_full_recompute(spark, tmp_path):
    src = str(tmp_path / "src")
    mv = str(tmp_path / "mv")
    commit_version(_src(spark, 300), src)
    create_matview(spark, mv, src, ["g"], MEASURES)
    commit_version(
        _src(spark, 150, tag=10_000).withColumn("k", F.col("k") + 1000),
        src, mode="append",
    )
    d = refresh_matview(spark, mv)
    assert d["mode"] == "append" and not d["rescanned"]
    assert matview_source_version(mv) == _manifests(src)[-1]
    _assert_equals_full(spark, mv, src, tmp_path, "append")


def test_merge_and_delete_refresh_exact_with_rescan(spark, tmp_path):
    src = str(tmp_path / "src")
    mv = str(tmp_path / "mv")
    commit_version(_src(spark, 400), src, stats_cols=["k"])
    create_matview(spark, mv, src, ["g"], MEASURES)
    # UPDATE: move some rows' values (changes sums, may move extremes)
    upd = _src(spark, 400).where(F.col("k") % 5 == 0).withColumn(
        "val", F.col("val") * 7
    )
    merge_version(spark, src, upd, ["k"], stats_cols=["k"])
    d1 = refresh_matview(spark, mv)
    assert d1["mode"] == "diff" and d1["rescanned"]
    _assert_equals_full(spark, mv, src, tmp_path, "merge")
    # DELETE the global max rows of each group: retraction alone cannot
    # find the runner-up — the rescan must
    delete_version_where(
        spark, src, F.col("k") >= 380, prune={"k": (380, None)},
        stats_cols=["k"],
    )
    d2 = refresh_matview(spark, mv)
    assert d2["mode"] == "diff" and d2["rescanned"]
    _assert_equals_full(spark, mv, src, tmp_path, "delete")


def test_sum_null_support_and_group_death(spark, tmp_path):
    src = str(tmp_path / "src")
    mv = str(tmp_path / "mv")
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", None), (3, "b", 5), (4, "c", 1)],
        "k long, g string, val long",
    )
    commit_version(df, src)
    create_matview(
        spark, mv, src, ["g"],
        {"n": ("count",), "total": ("sum", "val")},
    )
    # delete group a's only non-null value AND all of group c
    delete_version_where(spark, src, (F.col("k") == 1) | (F.col("g") == "c"))
    refresh_matview(spark, mv)
    got = {r["g"]: (r["n"], r["total"]) for r in read_matview(spark, mv).collect()}
    assert got == {"a": (1, None), "b": (1, 5)}  # c died; a's sum is NULL
    _mv2 = str(tmp_path / "ref")
    create_matview(
        spark, _mv2, src, ["g"], {"n": ("count",), "total": ("sum", "val")}
    )
    assert _rows(read_matview(spark, mv)) == _rows(read_matview(spark, _mv2))


def test_noop_refresh_is_metadata_only_and_idempotent(spark, tmp_path):
    src = str(tmp_path / "src")
    mv = str(tmp_path / "mv")
    commit_version(_src(spark, 100), src)
    create_matview(spark, mv, src, ["g"], {"n": ("count",)})
    before = _manifests(mv)
    tracker = spark.sparkContext.statusTracker()
    jobs_before = len(tracker.getJobIdsForGroup(None) or [])
    d = refresh_matview(spark, mv)
    jobs_after = len(tracker.getJobIdsForGroup(None) or [])
    assert d["mode"] == "noop"
    assert _manifests(mv) == before
    assert jobs_after == jobs_before  # zero Spark jobs
    # and refreshing after one change then again is a noop the 2nd time
    commit_version(_src(spark, 10, tag=5), src, mode="append")
    assert refresh_matview(spark, mv)["mode"] == "append"
    assert refresh_matview(spark, mv)["mode"] == "noop"


def test_additive_view_never_rescans(spark, tmp_path):
    src = str(tmp_path / "src")
    mv = str(tmp_path / "mv")
    commit_version(_src(spark, 200), src, stats_cols=["k"])
    create_matview(
        spark, mv, src, ["g"],
        {"n": ("count",), "total": ("sum", "val"), "avg_val": ("avg", "val")},
    )
    delete_version_where(spark, src, F.col("k") < 50)
    d = refresh_matview(spark, mv)
    assert d["mode"] == "diff" and not d["rescanned"]
    ref = str(tmp_path / "ref")
    create_matview(
        spark, ref, src, ["g"],
        {"n": ("count",), "total": ("sum", "val"), "avg_val": ("avg", "val")},
    )
    assert _rows(read_matview(spark, mv)) == _rows(read_matview(spark, ref))


def test_null_group_keys_survive_dirty_marking(spark, tmp_path):
    src = str(tmp_path / "src")
    mv = str(tmp_path / "mv")
    df = spark.createDataFrame(
        [(1, None, 10), (2, None, 20), (3, "b", 5)],
        "k long, g string, val long",
    )
    commit_version(df, src)
    create_matview(
        spark, mv, src, ["g"], {"n": ("count",), "hi": ("max", "val")}
    )
    delete_version_where(spark, src, F.col("k") == 2)  # NULL group loses max
    d = refresh_matview(spark, mv)
    assert d["rescanned"]
    got = {r["g"]: (r["n"], r["hi"]) for r in read_matview(spark, mv).collect()}
    assert got == {None: (1, 10), "b": (1, 5)}


def test_sidecar_fallback_after_lost_latest(spark, tmp_path):
    """Crash between MV commit and sidecar publish: refresh falls back
    to the previous sidecar's recorded source version — more delta
    re-read, never a wrong result (the refresh overwrites)."""
    src = str(tmp_path / "src")
    mv = str(tmp_path / "mv")
    commit_version(_src(spark, 100), src)
    create_matview(spark, mv, src, ["g"], {"n": ("count",), "total": ("sum", "val")})
    commit_version(_src(spark, 40, tag=7).withColumn("k", F.col("k") + 500),
                   src, mode="append")
    refresh_matview(spark, mv)
    # simulate the crash: latest sidecar lost
    latest = _manifests(mv)[-1]
    os.remove(os.path.join(mv, "_mv", f"v{latest}.json"))
    commit_version(_src(spark, 30, tag=9).withColumn("k", F.col("k") + 900),
                   src, mode="append")
    d = refresh_matview(spark, mv)
    # fell back to the older recorded version: re-reads both appends
    assert d["from_version"] == 0
    ref = str(tmp_path / "ref")
    create_matview(spark, ref, src, ["g"], {"n": ("count",), "total": ("sum", "val")})
    assert _rows(read_matview(spark, mv)) == _rows(read_matview(spark, ref))


def test_spec_validation(spark, tmp_path):
    src = str(tmp_path / "src")
    commit_version(_src(spark, 10), src)
    with pytest.raises(ValueError, match="unknown kind"):
        create_matview(spark, str(tmp_path / "m1"), src, ["g"],
                       {"x": ("median", "val")})
    with pytest.raises(ValueError, match="needs a column"):
        create_matview(spark, str(tmp_path / "m2"), src, ["g"],
                       {"x": ("sum",)})
    with pytest.raises(ValueError, match="reserved"):
        create_matview(spark, str(tmp_path / "m3"), src, ["g"],
                       {"__mv_x": ("count",)})
    with pytest.raises(ValueError, match="non-empty"):
        create_matview(spark, str(tmp_path / "m4"), src, [],
                       {"x": ("count",)})


def test_streaming_maintenance_exactly_once(spark, tmp_path):
    """matview_stream_sink: per-micro-batch append + incremental
    refresh; the final MV equals a from-scratch create, every refresh
    took the append fast path, and a REPLAYED batch (crash between
    checkpoint and commit) changes nothing — double idempotence."""
    from polygon_daily_market_data_pipeline_spark.operators.matview import (
        matview_stream_sink,
    )
    from polygon_daily_market_data_pipeline_spark.operators.versioned import (
        read_version,
    )

    df = _src(spark, 240)
    src_files = str(tmp_path / "in")
    df.repartition(3).write.parquet(src_files)
    source = str(tmp_path / "source")
    mv = str(tmp_path / "mv")
    measures = {"n": ("count",), "total": ("sum", "val"),
                "hi": ("max", "val")}
    # the MV exists before the stream: seeded from an empty slice
    commit_version(df.limit(0), source)
    create_matview(spark, mv, source, ["g"], measures)

    sink = matview_stream_sink(source, mv)
    q = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_files)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    ref = str(tmp_path / "ref")
    create_matview(spark, ref, source, ["g"], measures)
    assert _rows(read_matview(spark, mv)) == _rows(read_matview(spark, ref))
    # replay a batch by hand (the crash-between-commit-and-checkpoint
    # case): nothing may move
    mv_versions_before = _manifests(mv)
    src_versions_before = _manifests(source)
    sink(df.limit(50), 0)  # batch id 0 is behind the watermark
    assert _manifests(mv) == mv_versions_before
    assert _manifests(source) == src_versions_before
    assert _rows(read_matview(spark, mv)) == _rows(read_matview(spark, ref))


def test_refresh_exact_under_eqdel_and_dv(spark, tmp_path):
    """The diff path covers row-level deletes that change NO
    directories: equality deletes (erasure list) and deletion vectors
    (positional) — the MV must track visible rows, not files."""
    from polygon_daily_market_data_pipeline_spark.operators.versioned import (
        delete_version_keys,
        delete_version_vectors,
    )

    src = str(tmp_path / "src")
    mv = str(tmp_path / "mv")
    commit_version(_src(spark, 200), src)
    create_matview(spark, mv, src, ["g"], MEASURES)
    # equality delete: one whole group's keys
    delete_version_keys(
        spark, src, spark.createDataFrame([(3,)], "g bigint")
    )
    d1 = refresh_matview(spark, mv)
    assert d1["mode"] == "diff"
    _assert_equals_full(spark, mv, src, tmp_path, "eqdel")
    assert read_matview(spark, mv).where(F.col("g") == 3).count() == 0
    # deletion vectors: positional delete of a value band
    delete_version_vectors(spark, src, F.col("k") < 20)
    d2 = refresh_matview(spark, mv)
    assert d2["mode"] == "diff"
    _assert_equals_full(spark, mv, src, tmp_path, "dv")


def test_matview_cascade_over_matview(spark, tmp_path):
    """An MV is itself a versioned table, so an MV OVER an MV composes:
    the downstream refresh sees the upstream's overwrite commits via
    the bag-diff path and stays exact through the whole cascade."""
    src = str(tmp_path / "src")
    mv1 = str(tmp_path / "mv1")
    mv2 = str(tmp_path / "mv2")
    commit_version(_src(spark, 210), src)
    create_matview(
        spark, mv1, src, ["g"],
        {"n": ("count",), "total": ("sum", "val")},
    )
    # downstream re-aggregates the upstream VIEW's stored measures
    create_matview(
        spark, mv2, mv1, ["g"],
        {"rows_sum": ("sum", "n"), "grand": ("sum", "total")},
    )
    # source moves; refresh the cascade in order
    commit_version(
        _src(spark, 90, tag=777).withColumn("k", F.col("k") + 5000),
        src, mode="append",
    )
    delete_version_where(spark, src, F.col("k") < 30)
    assert refresh_matview(spark, mv1)["mode"] == "diff"
    d2 = refresh_matview(spark, mv2)
    assert d2["mode"] == "diff"  # upstream refreshes are overwrites
    ref = str(tmp_path / "ref")
    create_matview(
        spark, ref, mv1, ["g"],
        {"rows_sum": ("sum", "n"), "grand": ("sum", "total")},
    )
    assert _rows(read_matview(spark, mv2)) == _rows(read_matview(spark, ref))
    # and the cascade's grand totals equal direct source aggregation
    direct = (
        read_version(spark, src).groupBy("g")
        .agg(F.count(F.lit(1)).alias("rows_sum"), F.sum("val").alias("grand"))
    )
    assert _rows(read_matview(spark, mv2)) == _rows(direct)


def test_refresh_exact_after_source_schema_evolution(spark, tmp_path):
    """A source gaining a column must not disturb a view over the old
    columns: the delta surfaces the new column as NULL (read_changes /
    diff contract) and the measures never touch it."""
    src = str(tmp_path / "src")
    mv = str(tmp_path / "mv")
    commit_version(_src(spark, 120), src)
    create_matview(
        spark, mv, src, ["g"],
        {"n": ("count",), "total": ("sum", "val")},
    )
    evolved = _src(spark, 60, tag=50).withColumn(
        "k", F.col("k") + 9000
    ).withColumn("extra", F.lit("new"))
    commit_version(evolved, src, mode="append", schema_evolution=True)
    assert refresh_matview(spark, mv)["mode"] == "append"
    ref = str(tmp_path / "ref")
    create_matview(
        spark, ref, src, ["g"],
        {"n": ("count",), "total": ("sum", "val")},
    )
    assert _rows(read_matview(spark, mv)) == _rows(read_matview(spark, ref))


def test_filtered_matview_exact_and_blind_to_outside_rows(spark, tmp_path):
    """A WHERE'd view: every refresh path applies the stored predicate,
    so the view equals a from-scratch filtered create after appends and
    deletes — and rows OUTSIDE the predicate never perturb it."""
    src = str(tmp_path / "src")
    mv = str(tmp_path / "mv")
    commit_version(_src(spark, 200), src)
    pred = "k % 2 = 0"
    measures = {"n": ("count",), "total": ("sum", "val"),
                "hi": ("max", "val")}
    create_matview(spark, mv, src, ["g"], measures, where_sql=pred)
    before = _rows(read_matview(spark, mv))
    # an append entirely OUTSIDE the predicate: refresh must not move
    commit_version(
        _src(spark, 40, tag=1).withColumn(
            "k", F.col("k") * 2 + 4001  # odd keys only
        ),
        src, mode="append",
    )
    assert refresh_matview(spark, mv)["mode"] == "append"
    assert _rows(read_matview(spark, mv)) == before
    # a mixed append + a delete crossing the predicate boundary
    commit_version(
        _src(spark, 60, tag=2).withColumn("k", F.col("k") + 9000),
        src, mode="append",
    )
    refresh_matview(spark, mv)
    delete_version_where(spark, src, F.col("k").between(100, 160))
    d = refresh_matview(spark, mv)
    assert d["mode"] == "diff" and d["rescanned"]
    ref = str(tmp_path / "ref")
    create_matview(spark, ref, src, ["g"], measures, where_sql=pred)
    assert _rows(read_version(spark, mv).select("g", "n", "total", "hi")) \
        == _rows(read_version(spark, ref).select("g", "n", "total", "hi"))
    # and the view is exactly the filtered direct aggregate
    direct = (
        read_version(spark, src).where(pred).groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("val").alias("total"),
             F.max("val").alias("hi"))
    )
    assert _rows(read_matview(spark, mv)) == _rows(direct)


def test_rollup_matview_answers_coarser_queries(spark, tmp_path):
    """The aggregate-navigator rewrite: an MV grouped by (g, parity)
    answers GROUP BY g, GROUP BY parity, and the grand total from its
    partials alone — each exactly equal to direct source aggregation,
    0-vs-NULL included."""
    from polygon_daily_market_data_pipeline_spark.operators.matview import (
        rollup_matview,
    )

    src = str(tmp_path / "src")
    mv = str(tmp_path / "mv")
    commit_version(
        _src(spark, 300).withColumn("parity", F.col("k") % 2), src
    )
    create_matview(
        spark, mv, src, ["g", "parity"],
        {"n": ("count",), "total": ("sum", "val"),
         "avg_val": ("avg", "val"), "hi": ("max", "val")},
    )
    srcdf = read_version(spark, src)

    def direct(*cols):
        base = srcdf.groupBy(*cols) if cols else srcdf
        return base.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("val").alias("total"),
            F.avg("val").alias("avg_val"),
            F.max("val").alias("hi"),
        )

    for keys in (["g"], ["parity"], []):
        got = _rows(rollup_matview(spark, mv, keys))
        want = _rows(direct(*keys))
        assert got == want, keys
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not in the view's group keys"):
        rollup_matview(spark, mv, ["k"])
