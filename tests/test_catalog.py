"""Cross-table snapshot catalog (operators/catalog.py): consistent
multi-table reads under concurrent writers, explicit pins, OCC
publish races, whole-schema time travel and rollback."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polygon_daily_market_data_pipeline_spark.operators.catalog import (
    catalog_commit,
    catalog_rollback,
    catalog_snapshot,
    catalog_versions,
    read_catalog,
)
from polygon_daily_market_data_pipeline_spark.operators.versioned import (
    commit_version,
)


def _tables(spark, tmp_path):
    fact = str(tmp_path / "fact")
    dim = str(tmp_path / "dim")
    commit_version(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "a", 30)],
            "k long, g string, v long",
        ),
        fact,
    )
    commit_version(
        spark.createDataFrame([("a", "alpha"), ("b", "beta")],
                              "g string, label string"),
        dim,
    )
    return fact, dim


def test_snapshot_reads_are_torn_free(spark, tmp_path):
    """A catalog version pins BOTH tables: reads through it see the
    pinned instant even after both tables move — the torn-join cure."""
    fact, dim = _tables(spark, tmp_path)
    cat = str(tmp_path / "cat")
    v0 = catalog_commit(cat, {"fact": fact, "dim": dim})
    # both tables move on
    commit_version(
        spark.createDataFrame([(4, "b", 40)], "k long, g string, v long"),
        fact, mode="append",
    )
    commit_version(
        spark.createDataFrame([("a", "CHANGED"), ("b", "beta")],
                              "g string, label string"),
        dim,
    )
    j = read_catalog(spark, cat, "fact", v0).join(
        read_catalog(spark, cat, "dim", v0), "g"
    )
    rows = sorted((r.k, r.label) for r in j.collect())
    assert rows == [(1, "alpha"), (2, "beta"), (3, "alpha")]
    # latest catalog still resolves the OLD pins until someone re-pins
    assert read_catalog(spark, cat, "fact").count() == 3
    v1 = catalog_commit(cat, {"fact": fact, "dim": dim})
    assert read_catalog(spark, cat, "fact", v1).count() == 4
    assert read_catalog(spark, cat, "dim", v1).where(
        F.col("label") == "CHANGED"
    ).count() == 1
    # the old snapshot is unchanged — whole-schema time travel
    assert read_catalog(spark, cat, "dim", v0).where(
        F.col("label") == "CHANGED"
    ).count() == 0


def test_explicit_pins_and_validation(spark, tmp_path):
    fact, dim = _tables(spark, tmp_path)
    cat = str(tmp_path / "cat")
    commit_version(
        spark.createDataFrame([(9, "a", 90)], "k long, g string, v long"),
        fact, mode="append",
    )
    v = catalog_commit(cat, {"fact": (fact, 0), "dim": dim})
    assert read_catalog(spark, cat, "fact", v).count() == 3  # pinned pre-append
    with pytest.raises(LookupError, match="version 99"):
        catalog_commit(cat, {"fact": (fact, 99)})
    with pytest.raises(ValueError, match="non-empty"):
        catalog_commit(cat, {})
    with pytest.raises(LookupError, match="not in catalog"):
        read_catalog(spark, cat, "nope")


def test_occ_publish_and_rollback(spark, tmp_path):
    fact, dim = _tables(spark, tmp_path)
    cat = str(tmp_path / "cat")
    v0 = catalog_commit(cat, {"fact": fact, "dim": dim})
    # stale expected_version loses the race
    catalog_commit(cat, {"fact": fact, "dim": dim},
                   expected_version=v0)
    with pytest.raises(FileExistsError, match="re-read and retry"):
        catalog_commit(cat, {"fact": fact, "dim": dim},
                       expected_version=v0)
    # whole-schema rollback: a NEW version with the old pins
    commit_version(
        spark.createDataFrame([(4, "b", 40)], "k long, g string, v long"),
        fact, mode="append",
    )
    v2 = catalog_commit(cat, {"fact": fact, "dim": dim})
    assert read_catalog(spark, cat, "fact", v2).count() == 4
    v3 = catalog_rollback(cat, v0)
    assert v3 == v2 + 1 and catalog_versions(cat) == [0, 1, 2, 3]
    assert read_catalog(spark, cat, "fact", v3).count() == 3
    assert catalog_snapshot(cat, v3) == catalog_snapshot(cat, v0)


def test_catalog_sql_runs_over_pinned_views(spark, tmp_path):
    fact, dim = _tables(spark, tmp_path)
    cat = str(tmp_path / "cat")
    from polygon_daily_market_data_pipeline_spark.operators.catalog import (
        catalog_sql,
    )

    v0 = catalog_commit(cat, {"fact": fact, "dim": dim})
    commit_version(
        spark.createDataFrame([(4, "b", 40)], "k long, g string, v long"),
        fact, mode="append",
    )
    total = catalog_sql(
        spark, cat,
        "SELECT SUM(f.v) AS t FROM fact f JOIN dim d ON f.g = d.g",
        catalog_version=v0,
    ).first()["t"]
    assert total == 60  # pinned pre-append
    v1 = catalog_commit(cat, {"fact": fact, "dim": dim})
    total2 = catalog_sql(
        spark, cat,
        "SELECT SUM(f.v) AS t FROM fact f JOIN dim d ON f.g = d.g",
        catalog_version=v1,
    ).first()["t"]
    assert total2 == 100
