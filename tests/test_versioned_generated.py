"""Generated columns on versioned tables (Delta GENERATED ALWAYS AS
analog): defined at overwrite, a writer that OMITS the column gets it
computed (every append, including the streaming sink's), a writer that
SUPPLIES it is validated via the implicit ``name <=> (expr)`` CHECK —
so UPDATE images and MERGE inserts reject inconsistent values too, and
rename/drop of any involved column is refused by the checked-column
guard. The star-schema date_sk pattern: pair with ``stats_cols`` on
the generated key and derived-key predicates prune files."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polygon_daily_market_data_pipeline_spark.operators.versioned import (
    commit_version,
    drop_column,
    merge_version,
    read_version,
    rename_column,
    scan_version_with_stats,
    update_version_where,
)

GEN = {"date_sk": "CAST(date_format(d, 'yyyyMMdd') AS INT)"}


def _df(spark, lo=0, n=4, with_sk=False):
    df = spark.range(lo, lo + n).select(
        F.col("id").cast("long").alias("k"),
        F.expr("date_add(DATE'2024-01-01', CAST(id AS INT))").alias("d"),
        (F.col("id") * 10.0).alias("v"),
    )
    if with_sk:
        df = df.withColumn(
            "date_sk", F.expr("CAST(date_format(d, 'yyyyMMdd') AS INT)")
        )
    return df


def test_computed_on_overwrite_and_append(spark, tmp_path):
    t = str(tmp_path / "vt")
    commit_version(_df(spark), t, generated_cols=GEN, stats_cols=["date_sk"])
    got = {r.k: r.date_sk for r in read_version(spark, t).collect()}
    assert got == {0: 20240101, 1: 20240102, 2: 20240103, 3: 20240104}
    # append WITHOUT the column: computed
    commit_version(_df(spark, 4, 2), t, mode="append", stats_cols=["date_sk"])
    got = {r.k: r.date_sk for r in read_version(spark, t).collect()}
    assert got[4] == 20240105 and got[5] == 20240106
    # append WITH a consistent value: accepted
    commit_version(
        _df(spark, 6, 1, with_sk=True), t, mode="append",
        stats_cols=["date_sk"],
    )
    assert read_version(spark, t).count() == 7
    # append WITH an inconsistent value: the implicit CHECK refuses
    bad = _df(spark, 7, 1).withColumn("date_sk", F.lit(19990101))
    with pytest.raises(ValueError, match="gen_date_sk"):
        commit_version(bad, t, mode="append")
    # derived-key predicate prunes on the generated column's stats
    df, st = scan_version_with_stats(
        spark, t, {"date_sk": (20240105, 20240106)}
    )
    assert st.files_scheduled < st.files_total
    assert df.count() == 2


def test_generated_cols_append_only_refused_and_mutations_enforced(
    spark, tmp_path
):
    t = str(tmp_path / "vt")
    with pytest.raises(ValueError, match="overwrite"):
        commit_version(
            _df(spark), t, mode="append", generated_cols=GEN
        )
    commit_version(_df(spark), t, generated_cols=GEN)
    # UPDATE that breaks generation: the image check refuses
    with pytest.raises(ValueError, match="gen_date_sk"):
        update_version_where(
            spark, t, F.col("k") == 1, {"date_sk": F.lit(0)}
        )
    # UPDATE that moves d and date_sk consistently: fine
    update_version_where(
        spark, t, F.col("k") == 1,
        {"d": F.expr("DATE'2025-06-01'"), "date_sk": F.lit(20250601)},
    )
    assert (
        read_version(spark, t).where("k = 1").first().date_sk == 20250601
    )
    # MERGE insert with inconsistent generated value: refused
    src = _df(spark, 10, 1).withColumn("date_sk", F.lit(1))
    with pytest.raises(ValueError, match="gen_date_sk"):
        merge_version(spark, t, src, keys=["k"])
    # generated/source columns are CHECK-referenced: rename/drop refuse
    with pytest.raises(ValueError, match="CHECK"):
        rename_column(t, "date_sk", "sk")
    with pytest.raises(ValueError, match="CHECK"):
        drop_column(t, "d")
    # unrelated columns still move freely, and generation survives
    rename_column(t, "v", "val")
    commit_version(
        _df(spark, 20, 1).withColumnRenamed("v", "val"), t, mode="append"
    )
    assert (
        read_version(spark, t).where("k = 20").first().date_sk == 20240121
    )


def test_streaming_sink_computes_generated(spark, tmp_path):
    from polygon_daily_market_data_pipeline_spark.operators.versioned import (
        versioned_stream_sink,
    )

    t = str(tmp_path / "vt")
    commit_version(_df(spark, 0, 1), t, generated_cols=GEN)
    sink = versioned_stream_sink(t)
    sink(_df(spark, 1, 2), 0)  # foreachBatch callable, batch WITHOUT sk
    got = {r.k: r.date_sk for r in read_version(spark, t).collect()}
    assert got == {0: 20240101, 1: 20240102, 2: 20240103}
