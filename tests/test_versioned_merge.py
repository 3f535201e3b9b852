"""MERGE INTO a versioned table (operators/versioned.py merge_version)
— Delta-style copy-on-write upsert/key-delete. The contract under test:
result ≡ (target ⟕anti source-keys) ∪ source with NULL-safe key
matching, untouched commits carried by REFERENCE (files verbatim, stats
preserved), and the same redefinition discipline as delete/update (the
change feed refuses to cross a merge commit)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polygon_daily_market_data_pipeline_spark.operators.versioned import (
    commit_version,
    history,
    merge_version,
    read_changes,
    read_version,
    scan_version_with_stats,
)


def _base(spark, n=40):
    """k unique 0..n-1 (plus one NULL-key row), v = k * 1.0."""
    rows = spark.range(n).select(
        F.col("id").cast("long").alias("k"),
        (F.col("id") * 1.0).alias("v"),
        F.lit("base").alias("src"),
    )
    null_row = spark.range(1).select(
        F.lit(None).cast("long").alias("k"),
        F.lit(-1.0).alias("v"),
        F.lit("base").alias("src"),
    )
    return rows.unionByName(null_row)


def _rows(df):
    return sorted(
        ((r.k if r.k is not None else -1), r.v, r.src) for r in df.collect()
    )


def test_merge_upsert_matches_anti_union_null_safe(spark, tmp_path):
    """Matched target rows (incl. the NULL key, null-safely) are
    replaced by the source row; unmatched source rows are inserted;
    everything else survives untouched."""
    t = str(tmp_path / "vt")
    commit_version(_base(spark), t)
    source = spark.createDataFrame(
        [(3, 300.0, "upd"), (7, 700.0, "upd"), (None, -100.0, "upd"),
         (1000, 1.0, "ins")],
        "k long, v double, src string",
    )
    v = merge_version(spark, t, source, keys=["k"])
    got = read_version(spark, t, version=v)
    model = _rows(
        _base(spark).where(
            ~F.coalesce(F.col("k").isin(3, 7), F.lit(False))
            & F.col("k").isNotNull()
        )
    ) + _rows(source)
    assert _rows(got) == sorted(model)
    # pre-merge version still time-travelable, byte-for-byte
    assert _rows(read_version(spark, t, version=0)) == _rows(_base(spark))


def test_merge_carries_untouched_commit_by_reference(spark, tmp_path):
    """Two key-disjoint stats'd commits; a source whose keys fall only
    in the bottom half (plus inserts beyond the max key) must leave the
    top-half commit's files verbatim in the new version — and the
    carried files keep their data-skipping stats (a post-merge
    scan_version still prunes)."""
    t = str(tmp_path / "vt")
    base = spark.range(100).select(
        F.col("id").cast("long").alias("k"), (F.col("id") * 1.0).alias("v"),
        F.lit("base").alias("src"),
    )
    commit_version(
        base.where(F.col("k") < 50).repartitionByRange(2, "k"),
        t, stats_cols=["k"],
    )
    commit_version(
        base.where(F.col("k") >= 50).repartitionByRange(2, "k"),
        t, mode="append", stats_cols=["k"],
    )
    bottom = set(read_version(spark, t, version=0).inputFiles())
    top = set(read_version(spark, t, version=1).inputFiles()) - bottom
    source = spark.createDataFrame(
        [(10, 1e4, "upd"), (20, 2e4, "upd"), (200, 1.0, "ins"),
         (201, 2.0, "ins")],
        "k long, v double, src string",
    )
    v = merge_version(spark, t, source, keys=["k"], stats_cols=["k"])
    after = read_version(spark, t, version=v)
    files = set(after.inputFiles())
    assert top <= files, "untouched top-half commit must be carried verbatim"
    assert not (bottom & files), "touched bottom-half commit must be rewritten"
    assert after.count() == 102
    assert after.where(F.col("k") == 10).first().v == 1e4
    # carried + fresh stats both prune: a scan over the insert range
    # schedules a strict subset of the version's files
    scan, stats = scan_version_with_stats(spark, t, {"k": (150, None)})
    assert stats.files_scheduled < stats.files_total
    assert scan.count() == 2


def test_merge_insert_only_beyond_max_touches_nothing(spark, tmp_path):
    """Monotone business keys: a pure-insert source beyond the table's
    max key must rewrite NOTHING — the merge degrades to an append (all
    prior files carried by reference)."""
    t = str(tmp_path / "vt")
    base = spark.range(50).select(
        F.col("id").cast("long").alias("k"), (F.col("id") * 1.0).alias("v"),
        F.lit("base").alias("src"),
    )
    commit_version(base.repartitionByRange(3, "k"), t, stats_cols=["k"])
    before = set(read_version(spark, t).inputFiles())
    source = spark.createDataFrame(
        [(1000, 1.0, "ins"), (1001, 2.0, "ins")], "k long, v double, src string"
    )
    v = merge_version(spark, t, source, keys=["k"], stats_cols=["k"])
    after = read_version(spark, t, version=v)
    assert before <= set(after.inputFiles())
    assert after.count() == 52


def test_merge_null_source_key_disables_scoping_but_stays_correct(
    spark, tmp_path
):
    """A NULL source key can match NULL target keys, which min/max
    envelopes cannot see — discovery must fall back to rewriting every
    directory, and the null-keyed target row must be replaced."""
    t = str(tmp_path / "vt")
    commit_version(_base(spark).repartitionByRange(2, "k"), t, stats_cols=["k"])
    before = set(read_version(spark, t).inputFiles())
    source = spark.createDataFrame(
        [(None, -999.0, "upd")], "k long, v double, src string"
    )
    v = merge_version(spark, t, source, keys=["k"], stats_cols=["k"])
    after = read_version(spark, t, version=v)
    assert not (before & set(after.inputFiles()))
    assert after.where(F.col("k").isNull()).first().v == -999.0
    assert after.count() == _base(spark).count()


def test_merge_delete_is_key_list_delete(spark, tmp_path):
    """when_matched='delete': the source is an erasure key list — the
    delete a Column predicate cannot express — and NULL keys delete the
    NULL-keyed row null-safely. No insert directory is created."""
    t = str(tmp_path / "vt")
    commit_version(_base(spark), t)
    source = spark.createDataFrame(
        [(3, 0.0, "x"), (None, 0.0, "x"), (9999, 0.0, "x")],
        "k long, v double, src string",
    )
    v = merge_version(spark, t, source, keys=["k"], when_matched="delete")
    after = read_version(spark, t, version=v)
    assert _rows(after) == _rows(
        _base(spark).where(F.col("k").isNotNull() & (F.col("k") != 3))
    )


def test_merge_duplicate_source_keys_rejected(spark, tmp_path):
    t = str(tmp_path / "vt")
    commit_version(_base(spark), t)
    source = spark.createDataFrame(
        [(3, 1.0, "a"), (3, 2.0, "b")], "k long, v double, src string"
    )
    with pytest.raises(ValueError, match="duplicate key tuples"):
        merge_version(spark, t, source, keys=["k"])
    assert [h["version"] for h in history(t)] == [0]


def test_merge_schema_mismatch_rejected(spark, tmp_path):
    """update-mode inserts must agree with every carried directory's
    schema — a drifted source fails before any write."""
    t = str(tmp_path / "vt")
    commit_version(_base(spark), t)
    drifted = spark.createDataFrame(
        [(3, 1.0, "a", "extra")], "k long, v double, src string, e string"
    )
    with pytest.raises(ValueError, match="schema mismatch"):
        merge_version(spark, t, drifted, keys=["k"])
    # delete mode only reads the keys: the drifted frame is fine there
    v = merge_version(spark, t, drifted, keys=["k"], when_matched="delete")
    assert read_version(spark, t, version=v).where(F.col("k") == 3).count() == 0


def test_merge_expected_version_precondition(spark, tmp_path):
    t = str(tmp_path / "vt")
    commit_version(_base(spark), t)
    commit_version(_base(spark), t, mode="overwrite")
    source = spark.createDataFrame([(3, 1.0, "a")], "k long, v double, src string")
    with pytest.raises(FileExistsError, match="expected latest version 0"):
        merge_version(spark, t, source, keys=["k"], expected_version=0)
    assert [h["version"] for h in history(t)] == [0, 1]


def test_merge_blocks_change_feed(spark, tmp_path):
    """A merge commit REDEFINES rows — read_changes must refuse to
    cross it rather than emit wrong deltas, like delete/update."""
    t = str(tmp_path / "vt")
    commit_version(_base(spark), t)
    source = spark.createDataFrame([(3, 1.0, "u")], "k long, v double, src string")
    v = merge_version(spark, t, source, keys=["k"])
    with pytest.raises(ValueError, match="append-only"):
        read_changes(spark, t, 0, v)


def test_touched_dirs_discovery_bounded_jobs_on_wide_manifest(spark):
    """MERGE discovery on a 5K-directory manifest must stay a handful of
    Spark jobs, not #dirs/400 sequential flag passes: the global-range
    pre-pass (one aggregate) drops every envelope disjoint from the
    source's key range, so only the O(batch) candidate dirs reach the
    chunked flagging. Also pins the discovery's EXACTNESS on the
    synthetic manifest: exactly the overlapping envelopes come back."""
    from pyspark.sql import functions as F

    from polygon_daily_market_data_pipeline_spark.operators.versioned import (
        _touched_dirs,
    )

    covered = [
        (f"_data/d{i}", {"k": (i * 10, i * 10 + 9)}) for i in range(5000)
    ]
    source = spark.range(100, 150).select(F.col("id").alias("k")).persist()
    source.count()  # materialize outside the measured group
    sc = spark.sparkContext
    sc.setJobGroup("tdirs_probe", "touched-dirs discovery")
    try:
        touched = _touched_dirs(source, covered, ["k"])
    finally:
        sc.setJobGroup("", "")
        source.unpersist()
    jobs = sc.statusTracker().getJobIdsForGroup("tdirs_probe")
    # pre-pass + one ≤400-wide flag chunk (AQE may split each into 2)
    assert 1 <= len(jobs) <= 6, jobs
    # keys 100..149 overlap envelopes i*10..i*10+9 for i in 10..14 only
    assert sorted(touched) == [f"_data/d{i}" for i in range(10, 15)]


def test_merge_on_read_equals_copy_on_write(spark, tmp_path):
    """Twin law: strategy='merge_on_read' (matched rows tombstoned by
    position, zero directory rewrites) reads identically to the
    copy-on-write merge for update AND delete — including NULL keys,
    chained onto prior row-level deletes, and through materialize."""
    from pyspark.sql import functions as F

    from polygon_daily_market_data_pipeline_spark.operators.versioned import (
        commit_version,
        delete_version_keys,
        delete_version_vectors,
        materialize_dv,
        merge_version,
        read_version,
    )

    def build(t):
        df = spark.range(1000).select(
            F.col("id").cast("long").alias("k"), (F.col("id") * 1.0).alias("v")
        ).unionByName(
            spark.createDataFrame([(None, 0.5)], "k long, v double")
        )
        commit_version(
            df.where("k < 500 OR k IS NULL").repartition(4), t,
            stats_cols=["k"],
        )
        commit_version(
            df.where("k >= 500").repartitionByRange(4, "k"), t,
            mode="append", stats_cols=["k"],
        )
        # pre-existing row-level deletes of BOTH kinds
        delete_version_vectors(spark, t, F.col("k").between(40, 44))
        delete_version_keys(
            spark, t,
            spark.createDataFrame([(600,), (601,)], "k long"), ["k"],
        )

    src = spark.range(0, 100, 10).select(
        F.col("id").cast("long").alias("k"), F.lit(99.0).alias("v")
    ).unionByName(
        spark.createDataFrame(
            [(None, -0.5), (5000, -1.0)], "k long, v double"
        )
    )
    cow, mor = str(tmp_path / "cow"), str(tmp_path / "mor")
    build(cow)
    build(mor)
    merge_version(spark, cow, src, keys=["k"], stats_cols=["k"])
    data_before = set(
        f
        for f in read_version(spark, mor).inputFiles()
        if "_dv" not in f and "_eqdel" not in f
    )
    merge_version(
        spark, mor, src, keys=["k"], stats_cols=["k"],
        strategy="merge_on_read",
    )
    rows = lambda t: sorted(  # noqa: E731
        ((r.k, r.v) for r in read_version(spark, t).collect()),
        key=lambda x: (x[0] is None, x[0] or 0, x[1]),
    )
    assert rows(mor) == rows(cow)
    # MoR claim: every pre-merge data file still scheduled (no rewrite);
    # the only new data dir is the insert directory
    data_after = set(
        f
        for f in read_version(spark, mor).inputFiles()
        if "_dv" not in f and "_eqdel" not in f
    )
    assert data_before <= data_after
    # delete variant agrees too
    cow2, mor2 = str(tmp_path / "cow2"), str(tmp_path / "mor2")
    build(cow2)
    build(mor2)
    kdf = src.select("k")
    merge_version(spark, cow2, kdf, keys=["k"], when_matched="delete")
    merge_version(
        spark, mor2, kdf, keys=["k"], when_matched="delete",
        strategy="merge_on_read",
    )
    assert rows(mor2) == rows(cow2)
    # materialize compacts the tombstones, rows unchanged
    before = rows(mor)
    materialize_dv(spark, mor, stats_cols=["k"])
    assert rows(mor) == before


def test_merge_on_read_rejects_unknown_strategy(spark, tmp_path):
    import pytest
    from pyspark.sql import functions as F

    from polygon_daily_market_data_pipeline_spark.operators.versioned import (
        commit_version,
        merge_version,
    )

    t = str(tmp_path / "vt")
    commit_version(
        spark.range(5).select(F.col("id").alias("k")), t
    )
    with pytest.raises(ValueError, match="unknown strategy"):
        merge_version(
            spark, t, spark.range(1).select(F.col("id").alias("k")),
            keys=["k"], strategy="nope",
        )
