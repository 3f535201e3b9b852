"""Schema evolution on versioned tables (Delta mergeSchema analog):
``commit_version(..., mode="append", schema_evolution=True)`` may ADD
columns; every reader applies the version's MANIFEST schema, so
pre-evolution files read the added columns as NULL, time travel keeps
each version's own (narrower) contract, and copy-on-write rewrites
normalize old files to the full schema."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polygon_daily_market_data_pipeline_spark.operators.versioned import (
    commit_version,
    delete_version_where,
    history,
    merge_version,
    read_changes,
    read_version,
    scan_version,
)


def _v0(spark):
    return spark.range(10).select(
        F.col("id").cast("long").alias("k"), (F.col("id") * 1.0).alias("v")
    )


def _v1(spark):
    return spark.range(10, 15).select(
        F.col("id").cast("long").alias("k"),
        (F.col("id") * 1.0).alias("v"),
        F.lit("tagged").alias("w"),
    )


def test_evolved_append_reads_old_files_with_nulls(spark, tmp_path):
    t = str(tmp_path / "vt")
    commit_version(_v0(spark), t)
    # plain append with a drifted schema still refuses...
    with pytest.raises(ValueError, match="schema_evolution=True"):
        commit_version(_v1(spark), t, mode="append")
    # ...and the evolution opt-in widens the table
    v1 = commit_version(_v1(spark), t, mode="append", schema_evolution=True)
    latest = read_version(spark, t)
    assert latest.columns == ["k", "v", "w"]
    assert latest.count() == 15
    assert latest.where(F.col("w").isNull()).count() == 10
    assert latest.where(F.col("w") == "tagged").count() == 5
    # time travel: v0 keeps its own narrower schema
    assert read_version(spark, t, version=0).columns == ["k", "v"]
    # the change feed surfaces the delta in the evolved schema
    feed = read_changes(spark, t, 0, v1)
    assert feed.columns == ["k", "v", "w"]
    assert feed.count() == 5


def test_evolution_cannot_drop_or_retype(spark, tmp_path):
    t = str(tmp_path / "vt")
    commit_version(_v0(spark), t)
    dropped = spark.range(1).select(F.col("id").cast("long").alias("k"))
    with pytest.raises(ValueError, match="only ADD columns"):
        commit_version(dropped, t, mode="append", schema_evolution=True)
    retyped = spark.range(1).select(
        F.col("id").cast("long").alias("k"),
        F.col("id").cast("string").alias("v"),
    )
    with pytest.raises(ValueError, match="only ADD columns"):
        commit_version(retyped, t, mode="append", schema_evolution=True)
    assert [h["version"] for h in history(t)] == [0]


def test_copy_on_write_normalizes_after_evolution(spark, tmp_path):
    """DELETE after an evolution rewrites pre-evolution files through
    the manifest schema — survivors keep reading w as NULL, and the
    merged table accepts only evolved-schema sources."""
    t = str(tmp_path / "vt")
    commit_version(_v0(spark), t)
    commit_version(_v1(spark), t, mode="append", schema_evolution=True)
    delete_version_where(spark, t, F.col("k") % 2 == 1)
    after = read_version(spark, t)
    assert after.columns == ["k", "v", "w"]
    assert after.count() == 8  # 5 of 10 old + 3 of 5 new survive
    assert after.where(F.col("w").isNull()).count() == 5
    # merge: a pre-evolution-shaped source is now a schema mismatch...
    with pytest.raises(ValueError, match="schema mismatch"):
        merge_version(spark, t, _v0(spark), keys=["k"])
    # ...an evolved-schema source upserts across old and new files
    src = spark.createDataFrame(
        [(0, 99.0, "upd"), (14, 99.0, "upd"), (100, 1.0, "ins")],
        "k long, v double, w string",
    )
    v = merge_version(spark, t, src, keys=["k"])
    got = read_version(spark, t, version=v)
    assert got.count() == 9
    assert got.where(F.col("w") == "upd").count() == 2


def test_scan_version_prunes_evolved_table_exactly(spark, tmp_path):
    """Data skipping on a column added by evolution: pre-evolution files
    record no stats on it (kept conservatively) but the residual filter
    reads it as NULL there — the scan equals read+where exactly."""
    t = str(tmp_path / "vt")
    commit_version(_v0(spark).repartitionByRange(2, "k"), t, stats_cols=["k"])
    evolved = spark.range(10, 20).select(
        F.col("id").cast("long").alias("k"),
        (F.col("id") * 1.0).alias("v"),
        (F.col("id") * 10).cast("long").alias("w"),
    )
    commit_version(
        evolved.repartitionByRange(2, "k"),
        t,
        mode="append",
        schema_evolution=True,
        stats_cols=["k", "w"],
    )
    for preds in ({"k": (5, 12)}, {"w": (150, None)}):
        want = read_version(spark, t)
        for c, (lo, hi) in preds.items():
            if lo is not None:
                want = want.where(F.col(c) >= lo)
            if hi is not None:
                want = want.where(F.col(c) <= hi)
        got = scan_version(spark, t, preds)
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        ), preds


def test_streaming_snapshot_reads_evolved_table_nulls(spark, tmp_path):
    """The versioned_changes source over a SCHEMA-EVOLVED table: the
    per-file Arrow batches carry different physical schemas, and the
    reader must reconcile them to the bound manifest schema —
    pre-evolution files surface the added column as NULL (read_version
    contract at the Arrow layer), instead of the JVM rejecting the
    batch. Regression: this crashed with 'Value at index is null'
    before the reconcile + nullable-bound-schema fix."""
    import os

    from polygon_daily_market_data_pipeline_spark.operators.versioned import (
        commit_version,
    )
    from polygon_daily_market_data_pipeline_spark.sources import (
        versioned_changes_source,
    )

    t = str(tmp_path / "vt")
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    df = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
    )
    commit_version(df, t)
    ev = spark.range(50, 60).select(
        F.col("id").alias("k"),
        (F.col("id") * 1.0).alias("v"),
        F.lit(7).cast("long").alias("w"),
    )
    commit_version(ev, t, mode="append", schema_evolution=True)
    versioned_changes_source.register(spark)
    q = (
        spark.readStream.format("versioned_changes")
        .option("path", t)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 60
    assert got.where(F.col("w").isNull()).count() == 50
    assert got.where(F.col("w") == 7).count() == 10
