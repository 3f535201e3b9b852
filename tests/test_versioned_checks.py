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
