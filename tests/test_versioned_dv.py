"""Merge-on-read deletion vectors (operators/versioned.py
delete_version_vectors / materialize_dv): a DELETE that writes O(deleted
rows) bytes — one (file, pos) parquet sidecar + a manifest — instead of
rewriting every touched commit directory. The law under test everywhere:
DV-delete is READ-EQUIVALENT to copy-on-write delete on every path
(read_version, scan_version incl. stats/bloom pruning, diff_versions,
the streaming snapshot, rewrites that consume the table), while writing
none of the data files.

Reference parity note: the reference warehouse (Snowflake) gets this
from micro-partition metadata; Delta/Iceberg call it deletion vectors /
positional delete files. Same posture here on the manifest log."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from polygon_daily_market_data_pipeline_spark.operators.versioned import (
    clone_table,
    commit_version,
    delete_version_vectors,
    delete_version_where,
    diff_versions,
    drop_clone,
    materialize_dv,
    merge_version,
    optimize_zorder,
    read_changes,
    read_version,
    scan_version_with_stats,
    update_version_vectors,
    update_version_where,
    vacuum,
)


def _df(spark, lo=0, hi=1000):
    return spark.range(lo, hi).select(
        F.col("id").cast("long").alias("k"),
        (F.col("id") * 1.0).alias("v"),
        F.md5(F.col("id").cast("string")).alias("uid"),
    )


def _rows(df):
    return sorted((r.k, r.v, r.uid) for r in df.collect())


def _parquet_bytes(root):
    total = 0
    for r, _d, files in os.walk(root):
        total += sum(
            os.path.getsize(os.path.join(r, f))
            for f in files
            if f.endswith(".parquet")
        )
    return total


def test_dv_delete_rewrites_no_data_files(spark, tmp_path):
    """The headline property: the delete leaves every data file of the
    previous version in place (same inputFiles) and writes only the
    _dv sidecar — bytes written scale with DELETED ROWS, not table."""
    t = str(tmp_path / "vt")
    commit_version(_df(spark).repartitionByRange(8, "k"), t, stats_cols=["k"])
    data_bytes = _parquet_bytes(os.path.join(t, "_data"))
    before_files = set(read_version(spark, t).inputFiles())
    v1 = delete_version_vectors(spark, t, F.col("k") < 10, prune={"k": (None, 10)})
    assert v1 == 1
    # zero data-file churn
    assert _parquet_bytes(os.path.join(t, "_data")) == data_bytes
    assert set(read_version(spark, t).inputFiles()) >= before_files
    # the sidecar is tiny: 10 (file, pos) rows, orders below one data file
    dv_bytes = _parquet_bytes(os.path.join(t, "_dv"))
    assert 0 < dv_bytes < data_bytes / 4
    # reads: deleted rows gone, time travel intact
    assert read_version(spark, t).count() == 990
    assert read_version(spark, t, version=0).count() == 1000
    assert min(r.k for r in read_version(spark, t).collect()) == 10


def test_dv_equals_copy_on_write_on_every_read_path(spark, tmp_path):
    """Twin tables, same deletes — one merge-on-read, one copy-on-write.
    Every read path must agree exactly: full read, stats-pruned range
    scan, bloom point lookup, version diff."""
    mor = str(tmp_path / "mor")
    cow = str(tmp_path / "cow")
    for t in (mor, cow):
        commit_version(
            _df(spark).repartitionByRange(8, "k"), t,
            stats_cols=["k"], bloom_cols=["uid"],
        )
    pred1 = (F.col("k") % 7 == 3) & (F.col("k") < 500)
    pred2 = F.col("k").between(100, 120)
    for pred in (pred1, pred2):  # chained deletes too
        delete_version_vectors(spark, mor, pred)
        delete_version_where(spark, cow, pred)
    assert _rows(read_version(spark, mor)) == _rows(read_version(spark, cow))
    # stats-pruned range scan: equal rows, and the MoR side still prunes
    # (its stats envelopes survived because no file was rewritten)
    got_m, st_m = scan_version_with_stats(spark, mor, {"k": (200, 300)})
    got_c, _ = scan_version_with_stats(spark, cow, {"k": (200, 300)})
    assert _rows(got_m) == _rows(got_c)
    assert st_m.files_scheduled < st_m.files_total == 8
    # bloom point lookups: a deleted row is absent, a kept row present
    kept_uid = read_version(spark, mor).where(F.col("k") == 4).first().uid
    deleted_uid = (
        read_version(spark, mor, version=0).where(F.col("k") == 3).first().uid
    )
    for uid, want in ((kept_uid, 1), (deleted_uid, 0)):
        got, _ = scan_version_with_stats(spark, mor, {}, eq={"uid": uid})
        assert got.count() == want, uid
    # version diff across the DV commits equals the CoW diff bag
    def bag(t):
        return sorted(
            (r.k, r._change_type, r._n)
            for r in diff_versions(spark, t, 0).collect()
        )

    assert bag(mor) == bag(cow)


def test_dv_rededelete_is_noop_and_positions_never_double(spark, tmp_path):
    t = str(tmp_path / "vt")
    commit_version(_df(spark, 0, 100), t)
    v1 = delete_version_vectors(spark, t, F.col("k") < 10)
    # same predicate again: matches nothing on the VISIBLE rows
    assert delete_version_vectors(spark, t, F.col("k") < 10) == v1
    # overlapping predicate: only the NEW rows enter the vector
    v2 = delete_version_vectors(spark, t, F.col("k") < 15)
    m = json.load(open(os.path.join(t, "_versions", f"{v2}.json")))
    assert sum(e["n"] for e in m["dv"].values()) == 15  # not 25
    assert read_version(spark, t).count() == 85


def test_dv_carries_across_append_and_clears_on_overwrite(spark, tmp_path):
    t = str(tmp_path / "vt")
    commit_version(_df(spark, 0, 100), t)
    delete_version_vectors(spark, t, F.col("k") < 10)
    va = commit_version(_df(spark, 100, 120), t, mode="append")
    # appended rows visible, vectored rows still gone
    assert read_version(spark, t).count() == 90 + 20
    m = json.load(open(os.path.join(t, "_versions", f"{va}.json")))
    assert sum(e["n"] for e in m["dv"].values()) == 10
    vo = commit_version(_df(spark, 0, 5), t, mode="overwrite")
    m = json.load(open(os.path.join(t, "_versions", f"{vo}.json")))
    assert "dv" not in m  # fresh contents, no vectors
    assert read_version(spark, t).count() == 5


def test_rewrites_consume_visible_rows_and_materialize_their_dirs(
    spark, tmp_path
):
    """Copy-on-write UPDATE / MERGE / OPTIMIZE on a vectored table must
    operate on the VISIBLE rows (vectors applied) — and the directories
    they rewrite come out vector-free while carried dirs keep theirs."""
    t = str(tmp_path / "vt")
    # two COMMIT DIRS (the rewrite unit): vectors land in the first,
    # the scoped update touches only the second
    commit_version(_df(spark, 0, 50), t, stats_cols=["k"])
    commit_version(_df(spark, 50, 100), t, mode="append", stats_cols=["k"])
    delete_version_vectors(spark, t, F.col("k") < 10)
    # UPDATE scoped away from the vectored dir: carried dir keeps dv
    vu = update_version_where(
        spark, t, F.col("k") >= 90, {"v": F.lit(-1.0)},
        prune={"k": (90, None)}, stats_cols=["k"],
    )
    assert read_version(spark, t).count() == 90
    m = json.load(open(os.path.join(t, "_versions", f"{vu}.json")))
    assert sum(e["n"] for e in m["dv"].values()) == 10  # carried
    # UPDATE overlapping the vectored range: deleted rows must NOT be
    # resurrected into the rewrite
    vu2 = update_version_where(
        spark, t, F.col("k") < 20, {"v": F.lit(-2.0)},
        prune={"k": (None, 20)}, stats_cols=["k"],
    )
    got = read_version(spark, t)
    assert got.count() == 90
    assert got.where(F.col("k") < 10).count() == 0
    assert got.where(F.col("v") == -2.0).count() == 10  # k in [10, 20)
    m = json.load(open(os.path.join(t, "_versions", f"{vu2}.json")))
    assert "dv" not in m  # the vectored dir was rewritten clean
    # MERGE on a fresh vectored table: a source row keyed at a DELETED
    # key INSERTS (the target row is invisible), never double-matches
    t2 = str(tmp_path / "vt2")
    commit_version(_df(spark, 0, 50), t2)
    delete_version_vectors(spark, t2, F.col("k") == 7)
    src = _df(spark, 7, 9).withColumn("v", F.lit(100.0))
    merge_version(spark, t2, src, keys=["k"])
    rows = {r.k: r.v for r in read_version(spark, t2).collect()}
    assert rows[7] == 100.0 and rows[8] == 100.0 and len(rows) == 50
    # OPTIMIZE materializes everything
    vz = optimize_zorder(spark, t2, ["k"], n_files=2)
    m = json.load(open(os.path.join(t2, "_versions", f"{vz}.json")))
    assert "dv" not in m
    assert read_version(spark, t2).count() == 50


def test_update_dv_rewrites_no_data_files(spark, tmp_path):
    """MoR UPDATE twin of the delete headline: matched rows are
    tombstoned by position and their updated images appended — bytes
    written scale with MATCHED ROWS, no prior data file is touched."""
    t = str(tmp_path / "vt")
    commit_version(_df(spark).repartitionByRange(8, "k"), t, stats_cols=["k"])
    data_bytes = _parquet_bytes(os.path.join(t, "_data"))
    before_files = set(read_version(spark, t).inputFiles())
    v1 = update_version_vectors(
        spark, t, F.col("k") < 10, {"v": "v + 1000.0"},
        prune={"k": (None, 10)}, stats_cols=["k"],
    )
    assert v1 == 1
    # prior data files untouched; growth is ONE small appended dir
    assert before_files <= set(read_version(spark, t).inputFiles())
    new_bytes = _parquet_bytes(os.path.join(t, "_data")) - data_bytes
    assert 0 < new_bytes < data_bytes / 4
    got = read_version(spark, t)
    assert got.count() == 1000  # update, not delete
    v0_low = _rows(read_version(spark, t, version=0).where(F.col("k") < 10))
    assert _rows(got.where(F.col("k") < 10)) == sorted(
        (k, v + 1000.0, u) for k, v, u in v0_low
    )
    # time travel intact; no-op predicate publishes nothing
    assert read_version(spark, t, version=0).where(
        F.col("v") >= 1000.0
    ).count() == 0
    assert update_version_vectors(spark, t, F.col("k") < 0, {"v": "0.0"}) == v1


def test_update_dv_equals_copy_on_write_on_every_read_path(spark, tmp_path):
    """Twin tables, same chained updates — MoR vs CoW. Full read,
    stats-pruned scan, and the version diff bag must agree exactly."""
    mor = str(tmp_path / "mor")
    cow = str(tmp_path / "cow")
    for t in (mor, cow):
        commit_version(
            _df(spark).repartitionByRange(8, "k"), t, stats_cols=["k"]
        )
    upd1 = (F.col("k") % 7 == 3) & (F.col("k") < 500)
    upd2 = F.col("k").between(100, 120)
    for pred in (upd1, upd2):  # second update hits rows the first moved
        update_version_vectors(spark, mor, pred, {"v": "v * -1.0"})
        update_version_where(spark, cow, pred, {"v": F.expr("v * -1.0")})
    assert _rows(read_version(spark, mor)) == _rows(read_version(spark, cow))
    got_m, st_m = scan_version_with_stats(spark, mor, {"k": (200, 300)})
    got_c, _ = scan_version_with_stats(spark, cow, {"k": (200, 300)})
    assert _rows(got_m) == _rows(got_c)
    # the original 8 range files keep their stats envelopes (no file
    # was rewritten) and still prune; the stat-less image dirs are
    # simply unprunable, never wrongly skipped
    assert st_m.files_scheduled < st_m.files_total

    def bag(t):
        return sorted(
            (r.k, r._change_type, r._n)
            for r in diff_versions(spark, t, 0).collect()
        )

    assert bag(mor) == bag(cow)
    # change feed refuses to cross a row-level redefinition
    with pytest.raises(ValueError, match="update_dv"):
        read_changes(spark, mor, 0)


def test_update_dv_respects_checks_and_materializes(spark, tmp_path):
    """CHECK constraints veto the UPDATED IMAGES (nothing published);
    materialize_dv folds the tombstones + images into clean files."""
    t = str(tmp_path / "vt")
    commit_version(
        _df(spark, 0, 100), t, checks={"v_nonneg": "v >= 0"}
    )
    with pytest.raises(ValueError, match="v_nonneg"):
        update_version_vectors(spark, t, F.col("k") < 5, {"v": "-1.0"})
    assert read_version(spark, t).count() == 100  # nothing published
    v1 = update_version_vectors(spark, t, F.col("k") < 5, {"v": "v + 5.0"})
    vm = materialize_dv(spark, t)
    assert vm == v1 + 1
    m = json.load(open(os.path.join(t, "_versions", f"{vm}.json")))
    assert "dv" not in m
    got = read_version(spark, t)
    assert got.count() == 100
    assert got.where(F.col("k") < 5).agg(
        F.min("v").alias("mn")
    ).first().mn == 5.0


def test_materialize_dv_rewrites_only_vectored_dirs(spark, tmp_path):
    t = str(tmp_path / "vt")
    commit_version(_df(spark, 0, 100).repartitionByRange(2, "k"), t,
                   stats_cols=["k"])
    commit_version(_df(spark, 100, 200).repartitionByRange(2, "k"), t,
                   mode="append", stats_cols=["k"])
    untouched = set(read_version(spark, t, version=0).inputFiles())
    delete_version_vectors(
        spark, t, F.col("k") >= 150, prune={"k": (150, None)}
    )
    vm = materialize_dv(spark, t, stats_cols=["k"])
    after = read_version(spark, t)
    assert after.count() == 150
    # the first commit's files were never touched
    assert untouched <= set(after.inputFiles())
    m = json.load(open(os.path.join(t, "_versions", f"{vm}.json")))
    assert "dv" not in m
    # nothing vectored → no-op, no new version
    assert materialize_dv(spark, t) == vm
    # vacuum reclaims the sidecars once the DV versions age out
    vacuum(t, keep_last=1)
    dv_root = os.path.join(t, "_dv")
    assert not os.path.isdir(dv_root) or os.listdir(dv_root) == []


def test_change_feed_refuses_dv_crosses_materialize(spark, tmp_path):
    t = str(tmp_path / "vt")
    commit_version(_df(spark, 0, 50), t)
    vd = delete_version_vectors(spark, t, F.col("k") < 5)
    with pytest.raises(ValueError, match="delete_dv"):
        read_changes(spark, t, 0)
    commit_version(_df(spark, 50, 60), t, mode="append")
    feed = read_changes(spark, t, vd)
    assert sorted(r.k for r in feed.collect()) == list(range(50, 60))
    vm = materialize_dv(spark, t)
    # materialize is a same-rows relayout: the feed crosses it silently
    feed2 = read_changes(spark, t, vd)
    assert sorted(r.k for r in feed2.collect()) == list(range(50, 60))
    assert read_changes(spark, t, vm).count() == 0


def test_streaming_snapshot_excludes_vectored_rows(spark, tmp_path):
    """The versioned_changes streaming source's INITIAL SNAPSHOT of a
    vectored table must not emit deleted rows (the per-file Arrow
    reader masks vectored positions); a delete_dv mid-stream refuses
    like any redefinition."""
    from polygon_daily_market_data_pipeline_spark.sources import (
        versioned_changes_source,
    )

    t = str(tmp_path / "vt")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    commit_version(_df(spark, 0, 100).repartition(4), t)
    delete_version_vectors(spark, t, F.col("k") % 10 == 0)
    versioned_changes_source.register(spark)
    q = (
        spark.readStream.format("versioned_changes")
        .option("path", t)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r.k for r in spark.read.parquet(out).collect())
    assert got == [k for k in range(100) if k % 10 != 0]


def test_clone_carries_vectors_and_diverges(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    commit_version(_df(spark, 0, 100), src)
    delete_version_vectors(spark, src, F.col("k") < 10)
    clone_table(src, dst)
    assert _parquet_bytes(os.path.join(dst, "_data")) == 0
    assert _rows(read_version(spark, dst)) == _rows(read_version(spark, src))
    # DV-delete on the CLONE lands under the clone's _dv, source untouched
    delete_version_vectors(spark, dst, F.col("k") >= 95)
    assert read_version(spark, dst).count() == 85
    assert read_version(spark, src).count() == 90
    assert not os.path.isdir(os.path.join(src, "_dv")) or len(
        os.listdir(os.path.join(src, "_dv"))
    ) == 1
    drop_clone(src, dst)


def test_dv_composes_with_schema_evolution(spark, tmp_path):
    """Vector a pre-evolution file, then evolve: reads apply BOTH the
    widened manifest schema (added column NULL on old files) and the
    vectors."""
    t = str(tmp_path / "vt")
    commit_version(_df(spark, 0, 50), t)
    delete_version_vectors(spark, t, F.col("k") < 5)
    evolved = _df(spark, 50, 60).withColumn("w", F.lit(7).cast("long"))
    commit_version(evolved, t, mode="append", schema_evolution=True)
    got = read_version(spark, t)
    assert got.count() == 45 + 10
    assert got.where(F.col("k") < 5).count() == 0
    assert got.where(F.col("w").isNull()).count() == 45


def test_dv_scan_plan_broadcasts_and_pushes_down(spark, tmp_path):
    """Plan shape of the merge-on-read scan: the residual range filter
    must still reach the parquet scan (DataFilters — the anti-join must
    not fence pushdown), and a small vector side must join as a
    BROADCAST anti-join, decided from the manifest's deleted-pair
    counts (measured: AQE leaves the static SortMergeJoin in place even
    for a 100-row vector, so the engine decides, not hope)."""
    t = str(tmp_path / "vt")
    commit_version(
        spark.range(50_000)
        .select(F.col("id").cast("long").alias("k"), (F.col("id") * 1.0).alias("v"))
        .repartitionByRange(8, "k"),
        t,
        stats_cols=["k"],
    )
    delete_version_vectors(spark, t, F.col("k") % 500 == 7)
    got, _ = scan_version_with_stats(spark, t, {"k": (0, 10_000)})
    got.count()
    plan = got._jdf.queryExecution().executedPlan().toString()
    anti = [
        ln for ln in plan.splitlines() if "Join" in ln and "LeftAnti" in ln
    ]
    assert anti and all("BroadcastHashJoin" in ln for ln in anti), anti
    assert "SortMergeJoin" not in plan, "vector side should broadcast"
    pushed = [
        ln
        for ln in plan.splitlines()
        if "FileScan" in ln and "(k" in ln and ">= 0" in ln
    ]
    assert pushed, "range residual not pushed to the data scan"


def test_dv_writers_tolerate_a_table_column_named_pos(spark, tmp_path):
    """The merge-on-read writers' internal row-position column carries
    a reserved dunder name: a TABLE column named ``pos`` flows through
    delete/update/merge-on-read untouched."""
    t = str(tmp_path / "vt")
    df = spark.range(0, 100).select(
        F.col("id").alias("k"),
        (F.col("id") % 9).alias("pos"),
        (F.col("id") * 1.0).alias("v"),
    )
    commit_version(df, t)
    delete_version_vectors(spark, t, F.col("k") < 10)
    from polygon_daily_market_data_pipeline_spark.operators.versioned import (
        update_version_vectors,
    )

    update_version_vectors(spark, t, F.col("k") >= 90, {"v": "v + 1.0"})
    src = spark.range(5, 8).select(
        F.col("id").alias("k"),
        F.lit(77).cast("long").alias("pos"),
        F.lit(0.5).alias("v"),
    )
    merge_version(spark, t, src, keys=["k"], strategy="merge_on_read")
    got = {r.k: (r.pos, r.v) for r in read_version(spark, t).collect()}
    assert len(got) == 93  # 100 - 10 deleted + 3 merged-in (5,6,7)
    assert got[7] == (77, 0.5)
    assert got[95] == (95 % 9, 96.0)
    assert got[50] == (50 % 9, 50.0)
