"""Bin-packing small-file compaction (operators/versioned.py
optimize_compact): folds directories smaller than target_bytes into
~target-sized files as a new version with IDENTICAL visible rows; dirs
already at size are carried by reference (stats + bloom sidecars
intact). The streamed-table maintenance job: N micro-batch appends are
N tiny dirs until this folds them.

Laws under test: visible rows invariant on every read path; carried
dirs never rewritten (their files appear verbatim in the new version);
row-level deletes (dv + eqdel) consumed for compacted dirs, carried
for untouched ones; the change feed and the versioned_changes stream
cross the commit silently; time travel and vacuum behave like every
other relayout commit.

Reference parity note: the reference warehouse gets this from
Snowflake's automatic micro-partition compaction; Delta calls it
OPTIMIZE, Iceberg rewrite_data_files."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from polygon_daily_market_data_pipeline_spark.operators.versioned import (
    commit_version,
    delete_version_keys,
    delete_version_vectors,
    optimize_compact,
    read_changes,
    read_version,
    scan_version_with_stats,
    vacuum,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").cast("long").alias("k"),
        (F.col("id") * 1.0).alias("v"),
        F.md5(F.col("id").cast("string")).alias("uid"),
    )


def _rows(df):
    return sorted((r.k, r.v, r.uid) for r in df.collect())


def _data_files(df):
    return {f for f in df.inputFiles() if f"{os.sep}_dv{os.sep}" not in f}


def test_compact_folds_small_dirs_carries_big(spark, tmp_path):
    t = str(tmp_path / "vt")
    commit_version(
        _df(spark, 0, 20000).repartitionByRange(4, "k"), t, stats_cols=["k"]
    )
    big_files = _data_files(read_version(spark, t))
    for i in range(6):  # six micro-batch-sized appends, one dir each
        commit_version(
            _df(spark, 20000 + i * 100, 20000 + (i + 1) * 100),
            t,
            mode="append",
            stats_cols=["k"],
        )
    before = read_version(spark, t)
    want = _rows(before)
    files_before = _data_files(before)
    v = optimize_compact(spark, t, target_bytes=256 * 1024,
                         stats_cols=["k"])
    assert v == 7
    after = read_version(spark, t)
    assert _rows(after) == want
    files_after = _data_files(after)
    # the big commit's files carried verbatim; the six tiny dirs folded
    # into ONE coalesced file
    assert big_files <= files_after
    assert len(files_after) == len(big_files) + 1
    assert len(files_after) < len(files_before)
    m = json.load(open(os.path.join(t, "_versions", f"{v}.json")))
    assert m["mode"] == "optimize_compact"
    # time travel untouched; idempotent: the folded dir is small but
    # single-file and delete-free, so a second compact is a no-op
    assert read_version(spark, t, version=6).count() == after.count()
    assert optimize_compact(spark, t, target_bytes=256 * 1024) == v
    # the compacted output keeps pruning on its collected stats
    got, st = scan_version_with_stats(spark, t, {"k": (20100, 20150)})
    assert got.count() == 51
    assert st.files_scheduled < st.files_total
    # vacuum reclaims the pre-compact small dirs once aged out
    vacuum(t, keep_last=1)
    assert _rows(read_version(spark, t)) == want


def test_compact_bins_to_target_bytes(spark, tmp_path):
    """A tiny target forces MULTIPLE bins — each output dir holds one
    coalesced file and no bin mixes more bytes than the target."""
    t = str(tmp_path / "vt")
    for i in range(8):
        commit_version(
            _df(spark, i * 2000, (i + 1) * 2000),
            t,
            mode="append" if i else "overwrite",
        )
    sizes = {}
    data_root = os.path.join(t, "_data")
    for d in os.listdir(data_root):
        sizes[d] = sum(
            os.path.getsize(os.path.join(data_root, d, f))
            for f in os.listdir(os.path.join(data_root, d))
            if f.endswith(".parquet")
        )
    target = int(sum(sizes.values()) / 3)
    want = _rows(read_version(spark, t))
    v = optimize_compact(spark, t, target_bytes=target)
    m = json.load(open(os.path.join(t, "_versions", f"{v}.json")))
    packed = [d for d in m["dirs"] if d.startswith(f"_data{os.sep}k-")]
    assert 3 <= len(packed) <= 5  # first-fit-decreasing near the bound
    assert len(packed) == len(m["dirs"])  # every input dir was small
    assert _rows(read_version(spark, t)) == want


def test_compact_consumes_deletes_in_scope_keeps_carried(spark, tmp_path):
    t = str(tmp_path / "vt")
    commit_version(
        _df(spark, 0, 50000).repartitionByRange(4, "k"), t, stats_cols=["k"]
    )
    for i in range(3):
        commit_version(
            _df(spark, 50000 + i * 100, 50000 + (i + 1) * 100),
            t,
            mode="append",
        )
    # positional delete inside a SMALL dir (consumed by the rewrite),
    # one inside the BIG dir (carried), and an equality delete whose
    # scope spans both
    delete_version_vectors(spark, t, F.col("k").between(50000, 50004))
    delete_version_vectors(spark, t, F.col("k") < 5)
    delete_version_keys(
        spark,
        t,
        spark.createDataFrame([(50100,), (7,)], "k long"),
        ["k"],
    )
    want = _rows(read_version(spark, t))
    assert len(want) == 50300 - 5 - 5 - 2
    # target = the big dir's own byte size: strictly-smaller dirs fold,
    # the big dir itself is carried (robust to the session's codec)
    m0 = json.load(open(os.path.join(t, "_versions", "0.json")))
    big_dir = os.path.join(t, m0["dirs"][0])
    target = sum(
        os.path.getsize(os.path.join(big_dir, f))
        for f in os.listdir(big_dir)
        if f.endswith(".parquet")
    )
    v = optimize_compact(spark, t, target_bytes=target)
    after = read_version(spark, t)
    assert _rows(after) == want
    m = json.load(open(os.path.join(t, "_versions", f"{v}.json")))
    # the big dir's vector (k < 5) carried; the small dirs' metadata
    # consumed; the eqdel entry survives scoped to the big dir only
    assert sum(e["n"] for e in m["dv"].values()) == 5
    assert len(m.get("eqdel") or []) == 1
    carried = [d for d in m["dirs"] if not d.startswith(f"_data{os.sep}k-")]
    assert set(m["eqdel"][0]["dirs"]) <= set(carried)


def test_compact_change_feed_and_stream_cross_silently(spark, tmp_path):
    from polygon_daily_market_data_pipeline_spark.sources import (
        versioned_changes_source,
    )

    t = str(tmp_path / "vt")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    commit_version(_df(spark, 0, 100), t)
    v1 = commit_version(_df(spark, 100, 200), t, mode="append")

    versioned_changes_source.register(spark)

    def drain():
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

    drain()  # snapshot: 200 rows
    vc = optimize_compact(spark, t, target_bytes=64 * 1024 * 1024)
    v3 = commit_version(_df(spark, 200, 250), t, mode="append")
    # batch feed from BEFORE the compaction: only the append flows
    feed = read_changes(spark, t, v1)
    assert sorted(r.k for r in feed.collect()) == list(range(200, 250))
    assert read_changes(spark, t, vc).count() == 50
    drain()  # stream crosses the compact commit without re-emitting
    got = sorted(r.k for r in spark.read.parquet(out).collect())
    assert got == list(range(250))


def test_compact_noop_cases(spark, tmp_path):
    t = str(tmp_path / "vt")
    # one dir, one file, no deletes: nothing to gain
    commit_version(_df(spark, 0, 1000).coalesce(1), t)
    assert optimize_compact(spark, t, target_bytes=1 << 30) == 0
    # every dir at size: no-op even with many dirs
    t2 = str(tmp_path / "vt2")
    commit_version(_df(spark, 0, 1000), t2)
    commit_version(_df(spark, 1000, 2000), t2, mode="append")
    assert optimize_compact(spark, t2, target_bytes=1) == 1
    # but one MULTI-FILE small dir alone does compact (file-count fold)
    t3 = str(tmp_path / "vt3")
    commit_version(_df(spark, 0, 1000).repartition(8), t3)
    v = optimize_compact(spark, t3, target_bytes=1 << 30)
    assert v == 1
    assert len(_data_files(read_version(spark, t3))) == 1
    assert read_version(spark, t3).count() == 1000


def test_compact_refuses_on_moved_table_and_respects_schema(spark, tmp_path):
    t = str(tmp_path / "vt")
    commit_version(_df(spark, 0, 100), t)
    commit_version(_df(spark, 100, 200), t, mode="append")
    with pytest.raises(FileExistsError):
        optimize_compact(spark, t, expected_version=0)
    # schema evolution: compacted output carries the manifest schema
    evolved = _df(spark, 200, 260).withColumn("w", F.lit(3).cast("long"))
    commit_version(evolved, t, mode="append", schema_evolution=True)
    v = optimize_compact(spark, t, target_bytes=1 << 30)
    got = read_version(spark, t, version=v)
    assert got.count() == 260
    assert got.where(F.col("w").isNull()).count() == 200
    assert got.where(F.col("w") == 3).count() == 60


def test_replicate_changes_upsert_law_and_catchup(spark, tmp_path):
    """CDC replication law: after a drain, the replica holds EXACTLY
    the latest row per key across everything the source ever appended
    (in-batch collapse included); a later drain with the same
    checkpoint catches up incrementally; re-draining with nothing new
    changes nothing; and a redefining source commit fails the feed
    instead of replicating wrong deltas."""
    from polygon_daily_market_data_pipeline_spark.operators.versioned import (
        commit_version,
        delete_version_where,
        history,
        read_version,
        replicate_changes,
    )

    def batch(rows):
        return spark.createDataFrame(rows, "k long, seq long, v double")

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    # v0: keys 1-4; v1: re-version keys 2,3 (one key TWICE in the same
    # append — the in-batch collapse must pick seq 4) + new key 5
    commit_version(batch([(1, 1, 10.0), (2, 1, 20.0), (3, 1, 30.0), (4, 1, 40.0)]), src)
    commit_version(
        batch([(2, 2, 21.0), (3, 3, 31.0), (3, 4, 32.0), (5, 2, 50.0)]),
        src,
        mode="append",
    )
    n = replicate_changes(
        spark, src, dst, keys=["k"], order_col="seq", checkpoint=ckpt
    )
    assert n >= 1
    want = {1: 10.0, 2: 21.0, 3: 32.0, 4: 40.0, 5: 50.0}
    got = {r.k: r.v for r in read_version(spark, dst).collect()}
    assert got == want
    # incremental catch-up: another source append, same checkpoint
    commit_version(batch([(1, 5, 11.0), (6, 5, 60.0)]), src, mode="append")
    replicate_changes(
        spark, src, dst, keys=["k"], order_col="seq", checkpoint=ckpt
    )
    want.update({1: 11.0, 6: 60.0})
    got = {r.k: r.v for r in read_version(spark, dst).collect()}
    assert got == want
    # nothing new: a drain applies no batches and publishes no version
    versions_before = len(history(dst))
    n3 = replicate_changes(
        spark, src, dst, keys=["k"], order_col="seq", checkpoint=ckpt
    )
    assert n3 == 0
    assert len(history(dst)) == versions_before
    # a redefinition on the source refuses to replicate
    delete_version_where(spark, src, F.col("k") == 4)
    try:
        replicate_changes(
            spark, src, dst, keys=["k"], order_col="seq", checkpoint=ckpt
        )
        stream_failed = False
    except Exception:
        stream_failed = True
    assert stream_failed
    got = {r.k: r.v for r in read_version(spark, dst).collect()}
    assert got == want  # replica untouched by the refused feed


def test_compact_zorder_clusters_the_fold(spark, tmp_path):
    """zorder_by turns the fold into incremental clustering: streamed
    (unclustered) appends come out as ~target-sized z-ordered files
    that PRUNE on the z-column, while plain compaction of the same
    data yields one unprunable file per bin."""
    from polygon_daily_market_data_pipeline_spark.operators.versioned import (
        scan_version_with_stats,
    )

    t = str(tmp_path / "vt")
    # 8 appends, each spanning the WHOLE key range (hash-scattered like
    # real stream batches) — per-dir min/max prunes nothing
    for i in range(8):
        commit_version(
            _df(spark, 0, 16000).where(F.col("k") % 8 == i),
            t,
            mode="append" if i else "overwrite",
            stats_cols=["k"],
        )
    want = _rows(read_version(spark, t))
    sizes = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _d, fs in os.walk(os.path.join(t, "_data"))
        for f in fs
        if f.endswith(".parquet")
    )
    v = optimize_compact(
        spark, t, target_bytes=max(sizes // 4, 1), zorder_by=["k"]
    )
    after = read_version(spark, t)
    assert _rows(after) == want
    files = _data_files(after)
    # multiple ~target-sized z-split files — neither one megafile nor
    # the 8 input dirs' worth of scatter (FFD bin rounding gives 4-8)
    assert 3 <= len(files) <= 8
    # the z-split gives each file a tight k envelope: a 10% range scan
    # schedules a strict subset of the folded files
    got, st = scan_version_with_stats(spark, t, {"k": (0, 1600)})
    assert sorted(r.k for r in got.collect()) == list(range(0, 1601))
    assert st.files_scheduled < st.files_total
