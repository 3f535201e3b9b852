"""Sidecar bloom-filter skipping (operators/versioned.py bloom_cols +
scan_version(eq=...)): point lookups on high-cardinality columns the
file layout does NOT cluster — where every [min, max] envelope spans
the whole domain and range pruning keeps everything — must schedule
only the files whose bloom cannot rule the value out, with results
value-identical to read+filter."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from polygon_daily_market_data_pipeline_spark.operators.versioned import (
    commit_version,
    delete_version_where,
    optimize_zorder,
    read_version,
    scan_version,
    scan_version_with_stats,
)


def _tbl(spark, n=40_000):
    """Scattered layout: uid is an md5 (high-card string), k a scrambled
    int; repartition(16) gives every file the full value range, so
    min/max stats cannot prune either column."""
    return spark.range(n).select(
        F.col("id").cast("long").alias("k"),
        F.md5(F.col("id").cast("string")).alias("uid"),
        (F.col("id") % 1000 / 7.0).alias("v"),
    ).repartition(16)


def test_bloom_point_lookup_prunes_and_stays_exact(spark, tmp_path):
    t = str(tmp_path / "vt")
    commit_version(_tbl(spark), t, stats_cols=["k"], bloom_cols=["uid", "k"])
    target = read_version(spark, t).where(F.col("k") == 12345).first()
    for eq in ({"uid": target.uid}, {"k": 12345}, {"uid": target.uid, "k": 12345}):
        got, stats = scan_version_with_stats(spark, t, {}, eq=eq)
        rows = got.collect()
        assert len(rows) == 1 and rows[0].uid == target.uid, eq
        # the value lives in exactly one file; fp-rate 1% over 16 files
        # leaves generous headroom against flake
        assert stats.files_scheduled <= 4 < stats.files_total == 16, (eq, stats)


def test_bloom_absent_value_exact_empty(spark, tmp_path):
    t = str(tmp_path / "vt")
    commit_version(_tbl(spark), t, bloom_cols=["uid"])
    got, stats = scan_version_with_stats(
        spark, t, {}, eq={"uid": "not-a-real-digest"}
    )
    assert got.count() == 0
    assert stats.files_scheduled <= 4, stats


def test_bloom_sidecar_travels_with_append_carry(spark, tmp_path):
    """An appended commit WITHOUT blooms stays unprunable (kept whole)
    while the bloomed first commit still prunes — and the union is
    value-exact."""
    t = str(tmp_path / "vt")
    commit_version(_tbl(spark), t, bloom_cols=["uid"])
    extra = spark.range(40_000, 50_000).select(
        F.col("id").cast("long").alias("k"),
        F.md5(F.col("id").cast("string")).alias("uid"),
        (F.col("id") % 1000 / 7.0).alias("v"),
    ).repartition(4)
    commit_version(extra, t, mode="append")
    target_uid = extra.where(F.col("k") == 42_000).first().uid
    got, stats = scan_version_with_stats(spark, t, {}, eq={"uid": target_uid})
    # all 4 bloom-less files kept + ≤4 of the bloomed 16
    assert got.count() == 1
    assert 4 <= stats.files_scheduled <= 8, stats
    assert stats.files_total == 20


def test_eq_none_raises(spark, tmp_path):
    t = str(tmp_path / "vt")
    commit_version(_tbl(spark, n=100), t, bloom_cols=["uid"])
    with pytest.raises(ValueError, match="never matches NULL"):
        scan_version(spark, t, {}, eq={"uid": None})


def test_eq_unbloomables_stay_conservative(spark, tmp_path):
    """eq on a column with no bloom entry (float v) keeps every file —
    and the residual filter still makes the result exact."""
    t = str(tmp_path / "vt")
    commit_version(_tbl(spark, n=2_000), t, bloom_cols=["uid"])
    want = read_version(spark, t).where(F.col("v") == 3.0).count()
    got, stats = scan_version_with_stats(spark, t, {}, eq={"v": 3.0})
    assert got.count() == want > 0
    assert stats.files_scheduled == stats.files_total


def test_optimize_rebuilds_lapsed_bloom_index(spark, tmp_path):
    """A copy-on-write rewrite deliberately drops the touched dirs'
    sidecars (conservative: every file kept); OPTIMIZE with bloom_cols
    is the re-indexing point that restores point-lookup pruning."""
    t = str(tmp_path / "vt")
    commit_version(_tbl(spark), t, bloom_cols=["uid"])
    target = read_version(spark, t).where(F.col("k") == 12345).first()
    delete_version_where(spark, t, F.col("k") < 100)  # rewrites every dir
    got, stats = scan_version_with_stats(spark, t, {}, eq={"uid": target.uid})
    assert got.count() == 1
    assert stats.files_scheduled == stats.files_total  # blooms lapsed
    optimize_zorder(spark, t, ["k"], n_files=8, bloom_cols=["uid"])
    got2, stats2 = scan_version_with_stats(spark, t, {}, eq={"uid": target.uid})
    assert got2.count() == 1
    # zorder_write may coalesce a bucket: pin the prune, not the count
    assert stats2.files_scheduled <= 3 < stats2.files_total, stats2


def test_bloom_composes_with_range_stats(spark, tmp_path):
    """Range predicate on the clustered column AND a point lookup on the
    scattered one: the range prune cuts by envelope first, the bloom
    cuts the survivors."""
    t = str(tmp_path / "vt")
    df = _tbl(spark).repartitionByRange(16, "k")  # cluster k, scatter uid
    commit_version(df, t, stats_cols=["k"], bloom_cols=["uid"])
    target = read_version(spark, t).where(F.col("k") == 777).first()
    got, stats = scan_version_with_stats(
        spark, t, {"k": (0, 5_000)}, eq={"uid": target.uid}
    )
    rows = got.collect()
    assert len(rows) == 1 and rows[0].k == 777
    # range alone keeps ~2/16; bloom must not add files back
    assert stats.files_scheduled <= 3, stats
    # sidecar file is invisible to the reader
    assert not any(
        os.path.basename(f).startswith("_")
        for f in read_version(spark, t).inputFiles()
    )


def test_eq_and_range_on_same_column_intersect(spark, tmp_path):
    """A column in BOTH eq and predicates must enforce BOTH: the point
    envelope intersects the range for pruning AND an explicit equality
    residual applies (a setdefault would silently return the whole
    range while bloom-pruning on the point — two different row sets)."""
    t = str(tmp_path / "vt")
    commit_version(_tbl(spark, n=2_000), t, stats_cols=["k"], bloom_cols=["k"])
    got, stats = scan_version_with_stats(
        spark, t, {"k": (0, 100)}, eq={"k": 5}
    )
    rows = got.collect()
    assert len(rows) == 1 and rows[0].k == 5, rows
    # eq value OUTSIDE the range: the intersection is empty
    got2, _ = scan_version_with_stats(spark, t, {"k": (0, 100)}, eq={"k": 500})
    assert got2.count() == 0


def test_eq_type_mismatch_cannot_prune(spark, tmp_path):
    """An int eq value on a STRING column must NOT bloom-prune: the
    bloom hashed 's:...' keys, so 'i:5' is provably absent from every
    sidecar — pruning on it would silently drop rows the residual
    comparison (via Spark's implicit cast) matches."""
    t = str(tmp_path / "vt")
    df = spark.range(2_000).select(
        F.col("id").cast("string").alias("sk"),
        F.col("id").cast("long").alias("k"),
    ).repartition(8)
    commit_version(df, t, bloom_cols=["sk"])
    got, stats = scan_version_with_stats(spark, t, {}, eq={"sk": 5})
    rows = got.collect()
    assert len(rows) == 1 and rows[0].k == 5, rows
    assert stats.files_scheduled == stats.files_total  # no false prune
    # the correctly-typed lookup still prunes
    _, stats2 = scan_version_with_stats(spark, t, {}, eq={"sk": "5"})
    assert stats2.files_scheduled < stats2.files_total


def test_string_stats_truncated_but_exact(spark, tmp_path):
    """Long-string envelopes are truncated Delta-style (manifest stays
    O(files)) while every range scan stays value-identical to
    read+filter — the truncated hi is a true upper bound (incremented
    last kept char), the lo a true prefix lower bound."""
    import json
    import os

    t = str(tmp_path / "vt")
    df = spark.range(2_000).select(
        F.col("id").cast("long").alias("k"),
        # 100+-char strings ordered like k, so range-partitioning
        # clusters them and the envelopes are selective
        F.concat(
            F.lpad(F.col("id").cast("string"), 6, "0"), F.lit("x" * 100)
        ).alias("s"),
    ).repartitionByRange(8, "s")
    commit_version(df, t, stats_cols=["s"])
    # every recorded stat string is bounded
    vdir = os.path.join(t, "_versions")
    m = json.load(open(os.path.join(vdir, "0.json")))
    for ent in m["files"].values():
        rng = (ent["stats"] or {}).get("s")
        if rng:
            assert len(rng[0]["v"]) <= 65 and len(rng[1]["v"]) <= 65
    # scans are exact AND still prune (boundary-straddling predicate
    # whose lo shares the 64-char prefix with a truncated max)
    lo = "000100" + "x" * 100
    hi = "000500" + "x" * 100
    got, stats = scan_version_with_stats(spark, t, {"s": (lo, hi)})
    want = read_version(spark, t).where(
        (F.col("s") >= lo) & (F.col("s") <= hi)
    )
    assert sorted(got.collect()) == sorted(want.collect())
    assert got.count() == 401
    assert stats.files_scheduled < stats.files_total == 8
