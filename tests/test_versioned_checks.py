"""Table-level CHECK constraints on versioned tables: defined at
overwrite, recorded in the manifest, enforced in one aggregate pass on
every append and on value-mutating rewrites (UPDATE, MERGE inserts) —
a violating commit publishes NOTHING and its files are vacuum debris.
SQL CHECK semantics: NULL passes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polygon_daily_market_data_pipeline_spark.operators.versioned import (
    commit_version,
    history,
    merge_version,
    optimize_zorder,
    read_version,
    rollback,
    update_version_where,
    vacuum,
)

CHECKS = {"qty_positive": "v > 0", "kind_known": "kind IN ('a', 'b')"}


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v double, kind string")


def test_append_enforces_defined_checks(spark, tmp_path):
    t = str(tmp_path / "vt")
    commit_version(_df(spark, [(1, 1.0, "a")]), t, checks=CHECKS)
    commit_version(_df(spark, [(2, 2.0, "b")]), t, mode="append")  # valid
    with pytest.raises(ValueError, match="CHECK constraint 'qty_positive'"):
        commit_version(_df(spark, [(3, -1.0, "a")]), t, mode="append")
    with pytest.raises(ValueError, match="CHECK constraint 'kind_known'"):
        commit_version(_df(spark, [(3, 1.0, "z")]), t, mode="append")
    assert [h["version"] for h in history(t)] == [0, 1]
    assert read_version(spark, t).count() == 2
    # the two failed commits' files are debris, reclaimed by vacuum
    assert vacuum(t, keep_last=2) == 2


def test_null_passes_check(spark, tmp_path):
    t = str(tmp_path / "vt")
    commit_version(_df(spark, [(1, 1.0, "a")]), t, checks=CHECKS)
    v = commit_version(
        _df(spark, [(2, None, "a"), (3, 1.0, None)]), t, mode="append"
    )
    assert read_version(spark, t, version=v).count() == 3


def test_checks_param_rejected_on_append(spark, tmp_path):
    t = str(tmp_path / "vt")
    commit_version(_df(spark, [(1, 1.0, "a")]), t)
    with pytest.raises(ValueError, match="defined at overwrite"):
        commit_version(
            _df(spark, [(2, 1.0, "a")]), t, mode="append", checks=CHECKS
        )


def test_update_and_merge_enforce_checks(spark, tmp_path):
    t = str(tmp_path / "vt")
    commit_version(
        _df(spark, [(1, 1.0, "a"), (2, 2.0, "b")]), t, checks=CHECKS
    )
    with pytest.raises(ValueError, match="update on .* violates CHECK"):
        update_version_where(
            spark, t, F.col("k") == 1, {"v": F.lit(-5.0)}
        )
    with pytest.raises(ValueError, match="merge into .* violates CHECK"):
        merge_version(spark, t, _df(spark, [(9, 1.0, "zzz")]), keys=["k"])
    assert [h["version"] for h in history(t)] == [0]
    # valid forms of both still commit
    update_version_where(spark, t, F.col("k") == 1, {"v": F.lit(5.0)})
    merge_version(spark, t, _df(spark, [(9, 1.0, "b")]), keys=["k"])
    got = read_version(spark, t)
    assert got.count() == 3
    assert got.where(F.col("k") == 1).first().v == 5.0


def test_checks_survive_optimize_and_rollback(spark, tmp_path):
    t = str(tmp_path / "vt")
    commit_version(_df(spark, [(1, 1.0, "a")]), t, checks=CHECKS)
    optimize_zorder(spark, t, ["k"], n_files=1)
    with pytest.raises(ValueError, match="CHECK constraint"):
        commit_version(_df(spark, [(2, -1.0, "a")]), t, mode="append")
    rollback(t, to_version=0)
    with pytest.raises(ValueError, match="CHECK constraint"):
        commit_version(_df(spark, [(2, -1.0, "a")]), t, mode="append")
    # an overwrite REDEFINES the constraint set (here: drops it)
    commit_version(_df(spark, [(5, -9.0, "z")]), t, mode="overwrite")
    v = commit_version(_df(spark, [(6, -1.0, "q")]), t, mode="append")
    assert read_version(spark, t, version=v).count() == 2


def test_add_check_validates_then_enforces(spark, tmp_path):
    """Post-hoc constraint (ALTER TABLE ADD CONSTRAINT analog): the add
    validates every currently VISIBLE row (row-level deletes applied),
    refuses on violation publishing nothing, and once added is enforced
    on later appends exactly like overwrite-time checks. The change
    feed crosses the metadata-only commit silently."""
    from pyspark.sql import functions as F

    from polygon_daily_market_data_pipeline_spark.operators.versioned import (
        add_check,
        commit_version,
        delete_version_vectors,
        drop_check,
        history,
        read_changes,
        read_version,
    )

    t = str(tmp_path / "vt")
    df = spark.range(8).select(
        F.col("id").cast("long").alias("k"),
        (F.col("id") - 2.0).alias("v"),  # k=0,1 have v<0
    )
    commit_version(df, t, stats_cols=["k"])
    # violating rows visible: refuse, nothing published
    with pytest.raises(ValueError, match="existing rows"):
        add_check(spark, t, "v_pos", "v >= 0")
    assert len(history(t)) == 1
    # delete the violators merge-on-read; now the VISIBLE rows pass
    delete_version_vectors(spark, t, F.col("v") < 0)
    v = add_check(spark, t, "v_pos", "v >= 0")
    assert history(t)[-1]["mode"] == "add_check"
    # duplicate name refused
    with pytest.raises(ValueError, match="already exists"):
        add_check(spark, t, "v_pos", "v >= 1")
    # enforced on later appends
    bad = spark.range(1).select(
        F.col("id").cast("long").alias("k"), F.lit(-9.0).alias("v")
    )
    with pytest.raises(ValueError, match="v_pos"):
        commit_version(bad, t, mode="append")
    ok = spark.range(100, 102).select(
        F.col("id").cast("long").alias("k"), F.lit(1.0).alias("v")
    )
    commit_version(ok, t, mode="append")
    # the feed crosses add_check silently: delta after v is exactly ok
    assert read_changes(spark, t, v).count() == 2
    assert read_version(spark, t).count() == 8
    # drop: unknown name raises, known name stops enforcement
    with pytest.raises(LookupError):
        drop_check(t, "nope")
    drop_check(t, "v_pos")
    commit_version(bad, t, mode="append")
    assert read_version(spark, t).where(F.col("v") < 0).count() == 1


def test_append_racing_add_check_revalidates(spark, tmp_path, monkeypatch):
    """An append that loses its publish race to a concurrent add_check
    must RE-VALIDATE its already-written data against the new
    constraint set before the metadata-only retry: add_check only
    validates rows visible at ITS commit, so the loser's rows were
    never seen. Violating batch → refused loudly (debris for vacuum);
    passing batch → lands carrying the new checks and later appends
    enforce them."""
    import polygon_daily_market_data_pipeline_spark.operators.versioned as V
    from pyspark.sql import functions as F

    from polygon_daily_market_data_pipeline_spark.operators.versioned import (
        add_check,
        commit_version,
        read_version,
    )

    def frame(lo, v):
        return spark.range(lo, lo + 2).select(
            F.col("id").cast("long").alias("k"), F.lit(v).alias("v")
        )

    # case 1: violating loser refuses
    t = str(tmp_path / "vt1")
    commit_version(frame(0, 1.0), t)
    real = V._publish_manifest
    state = {"raced": False}

    def racing(table_dir, version, manifest):
        if not state["raced"] and manifest["mode"] == "append":
            state["raced"] = True
            add_check(spark, t, "v_pos", "v >= 0")
        return real(table_dir, version, manifest)

    monkeypatch.setattr(V, "_publish_manifest", racing)
    with pytest.raises(ValueError, match="v_pos"):
        V.commit_version(frame(10, -5.0), t, mode="append", retries=2)
    monkeypatch.setattr(V, "_publish_manifest", real)
    assert read_version(spark, t).where("v < 0").count() == 0
    assert history(t)[-1]["mode"] == "add_check"

    # case 2: passing loser rebases, carries the new checks forward
    t2 = str(tmp_path / "vt2")
    commit_version(frame(0, 1.0), t2)
    state2 = {"raced": False}

    def racing2(table_dir, version, manifest):
        if not state2["raced"] and manifest["mode"] == "append":
            state2["raced"] = True
            add_check(spark, t2, "v_pos", "v >= 0")
        return real(table_dir, version, manifest)

    monkeypatch.setattr(V, "_publish_manifest", racing2)
    V.commit_version(frame(10, 2.0), t2, mode="append", retries=2)
    monkeypatch.setattr(V, "_publish_manifest", real)
    assert read_version(spark, t2).count() == 4
    with pytest.raises(ValueError, match="v_pos"):
        commit_version(frame(20, -1.0), t2, mode="append")
