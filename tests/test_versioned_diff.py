"""diff_versions: row-level bag diff between any two versions of a
versioned table — the explicit diff the append-only change feed defers
to when rows were REDEFINED. The law under test: for every op sequence,

    rows(v_to) == rows(v_from) - deletes + inserts   (as bags)

while the scan touches ONLY the directory-set difference."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from polygon_daily_market_data_pipeline_spark.operators.versioned import (
    clone_table,
    commit_version,
    delete_version_where,
    diff_versions,
    merge_version,
    read_version,
    update_version_where,
)


def _df(spark, lo, hi, tag="t"):
    return spark.range(lo, hi).select(
        F.col("id").cast("long").alias("k"),
        (F.col("id") * 1.0).alias("v"),
        F.lit(tag).alias("s"),
    )


def _bag(df):
    return Counter((r.k, r.v, r.s) for r in df.collect())


def _apply_diff(base: Counter, diff_rows) -> Counter:
    out = Counter(base)
    for r in diff_rows:
        key = (r.k, r.v, r.s)
        if r._change_type == "insert":
            out[key] += r._n
        else:
            out[key] -= r._n
    return +out  # drop zero-count entries


def _law(spark, t, v_from, v_to):
    before = _bag(read_version(spark, t, version=v_from))
    after = _bag(read_version(spark, t, version=v_to))
    diff = diff_versions(spark, t, v_from, v_to).collect()
    assert _apply_diff(before, diff) == after
    return diff


def test_diff_after_merge_delete_update_overwrite(spark, tmp_path):
    t = str(tmp_path / "vt")
    commit_version(
        _df(spark, 0, 100).repartitionByRange(4, "k"), t, stats_cols=["k"]
    )
    src = _df(spark, 90, 120, tag="new")
    v1 = merge_version(spark, t, src, keys=["k"], stats_cols=["k"])
    diff = _law(spark, t, 0, v1)
    # 10 replaced (old out, new in) + 20 inserted
    ins = sum(r._n for r in diff if r._change_type == "insert")
    dels = sum(r._n for r in diff if r._change_type == "delete")
    assert (ins, dels) == (30, 10)
    v2 = delete_version_where(
        spark, t, F.col("k") < 5, prune={"k": (None, 5)}, stats_cols=["k"]
    )
    _law(spark, t, v1, v2)
    v3 = update_version_where(
        spark, t, F.col("k") >= 110, {"v": F.lit(-1.0)}, stats_cols=["k"]
    )
    _law(spark, t, v2, v3)
    commit_version(_df(spark, 0, 7), t, mode="overwrite")
    _law(spark, t, v3, v3 + 1)
    # spanning diff across the whole redefinition chain
    _law(spark, t, 0, v3 + 1)
    # degenerate: identical versions diff to nothing
    assert diff_versions(spark, t, v2, v2).count() == 0


def test_diff_reads_only_changed_directories(spark, tmp_path):
    """The untouched commit must not appear in the diff's scan — the
    O(changed data) claim, checked against the plan's file list."""
    t = str(tmp_path / "vt")
    commit_version(
        _df(spark, 0, 50).repartitionByRange(2, "k"), t, stats_cols=["k"]
    )
    commit_version(
        _df(spark, 50, 100).repartitionByRange(2, "k"),
        t, mode="append", stats_cols=["k"],
    )
    untouched = set(read_version(spark, t, version=0).inputFiles())
    v = delete_version_where(
        spark, t, F.col("k") >= 90, prune={"k": (90, None)}, stats_cols=["k"]
    )
    diff = diff_versions(spark, t, 1, v)
    assert not (set(diff.inputFiles()) & untouched)
    assert sorted((r.k, r._change_type, r._n) for r in diff.collect()) == [
        (k, "delete", 1) for k in range(90, 100)
    ]


def test_diff_handles_duplicates_and_nulls(spark, tmp_path):
    """Bag semantics: duplicate rows diff by multiplicity; NULL cells
    match NULL cells."""
    t = str(tmp_path / "vt")
    base = _df(spark, 0, 3).unionByName(_df(spark, 0, 3)).unionByName(
        spark.createDataFrame([(None, None, None)], "k long, v double, s string")
    )
    commit_version(base, t)
    commit_version(
        _df(spark, 0, 3).unionByName(
            spark.createDataFrame(
                [(None, None, None), (None, None, None)],
                "k long, v double, s string",
            )
        ),
        t,
        mode="overwrite",
    )
    diff = _law(spark, t, 0, 1)
    by_type = Counter(r._change_type for r in diff)
    # one copy of each duplicated (k,v,s) leaves; one extra NULL row enters
    assert by_type == {"delete": 3, "insert": 1}


def test_diff_across_schema_evolution(spark, tmp_path):
    t = str(tmp_path / "vt")
    commit_version(_df(spark, 0, 10), t)
    evolved = _df(spark, 10, 12).withColumn("w", F.lit(7).cast("long"))
    commit_version(evolved, t, mode="append", schema_evolution=True)
    diff = diff_versions(spark, t, 0, 1)
    rows = diff.collect()
    # pure append: the delta dirs are exactly the new commit
    assert all(r._change_type == "insert" for r in rows)
    assert sorted(r.k for r in rows) == [10, 11]
    assert all(r.w == 7 for r in rows)


def test_diff_map_rejection_ignores_field_metadata(spark, tmp_path):
    """Only STRUCTURAL map types reject: a column whose user metadata
    happens to contain {'type': 'map'} must still diff (and an actual
    MAP column must still raise)."""
    t = str(tmp_path / "vt")
    base = _df(spark, 0, 5).withMetadata("k", {"type": "map"})
    commit_version(base, t)
    commit_version(_df(spark, 0, 7).withMetadata("k", {"type": "map"}),
                   t, mode="overwrite")
    assert diff_versions(spark, t, 0, 1).count() == 2
    t2 = str(tmp_path / "vt2")
    commit_version(
        spark.range(3).select("id", F.create_map(F.lit("a"), F.col("id")).alias("m")),
        t2,
    )
    commit_version(
        spark.range(4).select("id", F.create_map(F.lit("a"), F.col("id")).alias("m")),
        t2, mode="overwrite",
    )
    with pytest.raises(ValueError, match="MAP"):
        diff_versions(spark, t2, 0, 1)


def test_diff_law_under_random_op_sequences(spark, tmp_path):
    """Randomized model check: after EVERY commit (overwrite, append,
    copy-on-write delete/update/merge, rollback, optimize), the diff
    between the previous and new latest version, applied to the
    previous model bag, must reproduce the new model bag — including
    the optimize case, whose full rewrite must bag-cancel to an EMPTY
    diff (same rows, new layout)."""
    import random

    from polygon_daily_market_data_pipeline_spark.operators.versioned import (
        delete_version_keys,
        delete_version_vectors,
        materialize_dv,
        optimize_zorder,
        rollback,
    )

    for seed in range(3):
        rng = random.Random(seed)
        t = str(tmp_path / f"vt_{seed}")
        commit_version(_df(spark, 0, 8, "b0"), t)
        model = {0: _bag(_df(spark, 0, 8, "b0"))}
        latest = 0
        for step in range(6):
            op = rng.choice(
                ["overwrite", "append", "delete", "update", "merge",
                 "rollback", "optimize", "delete_dv", "materialize_dv",
                 "delete_eq"]
            )
            tag = f"s{seed}b{step}"
            if op == "overwrite":
                v = commit_version(_df(spark, 0, 6, tag), t)
                model[v] = _bag(_df(spark, 0, 6, tag))
            elif op == "append":
                v = commit_version(_df(spark, 0, 4, tag), t, mode="append")
                model[v] = model[latest] + _bag(_df(spark, 0, 4, tag))
            elif op == "delete":
                b = rng.randrange(0, 6)
                v = delete_version_where(spark, t, F.col("k") < b)
                model[v] = Counter(
                    {r: n for r, n in model[latest].items() if r[0] >= b}
                )
            elif op == "update":
                b = rng.randrange(0, 6)
                v = update_version_where(
                    spark, t, F.col("k") >= b, {"v": F.lit(-1.0)}
                )
                model[v] = Counter()
                for (k, val, s), n in model[latest].items():
                    key = (k, -1.0 if k >= b else val, s)
                    model[v][key] += n
            elif op == "merge":
                b = rng.randrange(0, 8)
                src = _df(spark, b, 10, tag)
                v = merge_version(
                    spark, t, src, keys=["k"],
                    strategy=rng.choice(["copy_on_write", "merge_on_read"]),
                )
                model[v] = Counter(
                    {r: n for r, n in model[latest].items() if r[0] < b}
                ) + _bag(src)
            elif op == "delete_dv":
                # merge-on-read delete: dirs UNCHANGED, rows gone — the
                # diff must surface the vectored rows as deletes
                b = rng.randrange(0, 6)
                v = delete_version_vectors(spark, t, F.col("k") < b)
                if v == latest:  # nothing matched: no commit
                    continue
                model[v] = Counter(
                    {r: n for r, n in model[latest].items() if r[0] >= b}
                )
            elif op == "materialize_dv":
                v = materialize_dv(spark, t)
                if v == latest:  # nothing vectored: no commit
                    continue
                model[v] = model[latest]
                # same visible rows: the bag diff is EMPTY
                assert diff_versions(spark, t, latest, v).count() == 0
            elif op == "delete_eq":
                b = rng.randrange(0, 6)
                kdf = spark.range(b).select(
                    F.col("id").cast("long").alias("k")
                )
                v = delete_version_keys(spark, t, kdf, ["k"])
                if v == latest:  # empty key frame: no commit
                    continue
                model[v] = Counter(
                    {r: n for r, n in model[latest].items() if r[0] >= b}
                )
            elif op == "rollback":
                back = rng.choice(sorted(model))
                v = rollback(t, to_version=back)
                model[v] = model[back]
            else:
                v = optimize_zorder(
                    spark, t, ["k"], n_files=2, expected_version=latest
                )
                model[v] = model[latest]
                # full rewrite, identical rows: the bag diff is EMPTY
                assert diff_versions(spark, t, latest, v).count() == 0
            got = _apply_diff(
                model[latest],
                diff_versions(spark, t, latest, v).collect(),
            )
            assert got == model[v], (seed, step, op)
            latest = v
