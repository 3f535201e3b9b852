"""Shallow clone (Delta SHALLOW CLONE semantics): the clone's v0 sees
the source's latest version by reference — one JSON write, zero data
copied — and all writes to the clone are copy-on-write against the
shared files, never touching the source."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from polygon_daily_market_data_pipeline_spark.operators.versioned import (
    clone_table,
    commit_version,
    delete_version_where,
    drop_clone,
    read_version,
    scan_version_with_stats,
    vacuum,
)


def _df(spark, lo=0, hi=1000):
    return spark.range(lo, hi).select(
        F.col("id").cast("long").alias("k"), (F.col("id") * 1.0).alias("v")
    )


def _parquet_bytes(root):
    total = 0
    for r, _d, files in os.walk(root):
        total += sum(
            os.path.getsize(os.path.join(r, f))
            for f in files
            if f.endswith(".parquet")
        )
    return total


def test_clone_is_zero_copy_and_reads_equal(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    commit_version(
        _df(spark).repartitionByRange(4, "k"), src, stats_cols=["k"],
        checks={"v_nonneg": "v >= 0"},
    )
    clone_table(src, dst)
    assert _parquet_bytes(dst) == 0  # no data copied
    assert sorted(read_version(spark, dst).collect()) == sorted(
        read_version(spark, src).collect()
    )
    # carried stats prune on the clone
    _scan, stats = scan_version_with_stats(spark, dst, {"k": (0, 100)})
    assert stats.files_scheduled < stats.files_total == 4
    # carried CHECK constraints enforce on the clone
    bad = spark.createDataFrame([(1, -5.0)], "k long, v double")
    with pytest.raises(ValueError, match="CHECK constraint"):
        commit_version(bad, dst, mode="append")
    with pytest.raises(FileExistsError, match="already has versions"):
        clone_table(src, dst)


def test_clone_writes_never_touch_source(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    commit_version(_df(spark).repartitionByRange(4, "k"), src, stats_cols=["k"])
    clone_table(src, dst)
    src_files = set(read_version(spark, src).inputFiles())
    src_rows = sorted(read_version(spark, src).collect())
    commit_version(_df(spark, 1000, 1100), dst, mode="append")
    delete_version_where(
        spark, dst, F.col("k") < 10, prune={"k": (None, 10)},
        stats_cols=["k"],
    )
    # clone state diverged...
    assert read_version(spark, dst).count() == 1000 + 100 - 10
    # ...while the source is bit-for-bit where it was
    assert set(read_version(spark, src).inputFiles()) == src_files
    assert sorted(read_version(spark, src).collect()) == src_rows
    assert all(os.path.exists(f.replace("file:", "")) for f in src_files)


def test_source_vacuum_refuses_while_clone_lives(spark, tmp_path):
    """A cloned table must survive a source vacuum ATTEMPT: the clone
    registers a marker with the source, vacuum refuses while it lives,
    drop_clone (or force=True) is the explicit override."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    commit_version(_df(spark), src)  # v0 — the dirs the clone references
    clone_table(src, dst)
    commit_version(_df(spark, 0, 10), src, mode="overwrite")  # src moves on
    with pytest.raises(RuntimeError, match="live shallow clone"):
        vacuum(src, keep_last=1)  # would reclaim v0's dirs under the clone
    # the refused vacuum left the clone fully readable
    assert read_version(spark, dst).count() == 1000
    assert drop_clone(src, dst) == 1
    assert vacuum(src, keep_last=1) >= 1  # unblocked once unregistered
    # force=True is the explicit break-the-clone override
    dst2 = str(tmp_path / "dst2")
    clone_table(src, dst2)
    commit_version(_df(spark, 0, 5), src, mode="overwrite")
    vacuum(src, keep_last=1, force=True)
    assert drop_clone(src, dst2) == 1  # marker still there until dropped


def test_vacuum_on_clone_spares_source_files(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    commit_version(_df(spark), src)
    clone_table(src, dst)
    commit_version(_df(spark, 0, 10), dst, mode="overwrite")  # clone moves on
    vacuum(dst, keep_last=1)  # v0 (the reference manifest) aged out
    # the source's data is intact and readable
    assert read_version(spark, src).count() == 1000
    assert read_version(spark, dst).count() == 10


def test_clone_carries_partition_tags_and_historical_fork(spark, tmp_path):
    """Partition tags ride the clone (re-keyed to its absolute-dir
    frame) so partition pruning and drop_partitions keep working; and
    at_version forks the HISTORICAL manifest, tags included."""
    from polygon_daily_market_data_pipeline_spark.operators.versioned import (
        drop_partitions,
    )

    src = str(tmp_path / "src")
    commit_version(_df(spark, 0, 100), src, partition_values={"day": "d1"})
    commit_version(
        _df(spark, 100, 200), src, mode="append", partition_values={"day": "d2"}
    )
    commit_version(
        _df(spark, 200, 300), src, mode="append", partition_values={"day": "d3"}
    )
    dst = str(tmp_path / "dst")
    clone_table(src, dst, at_version=1)  # historical: d1+d2 only
    assert read_version(spark, dst).count() == 200
    assert read_version(spark, dst, partitions={"day": "d1"}).count() == 100
    # metadata-only retention works on the clone (tags were carried)
    drop_partitions(dst, {"day": "d1"})
    assert read_version(spark, dst).count() == 100
    # the source is untouched at its own head
    assert read_version(spark, src).count() == 300
