"""Multi-writer OCC beyond append-vs-append (VERDICT r8 next-round #4):
row-level commits (deletion vectors, equality deletes) that lose the
manifest race to a PROVABLY-DISJOINT commit must rebase and land, and
conflicting interleavings must still refuse — the Delta
conflict-resolution posture (WriteSerializable flavor) on the manifest
log. Races are injected deterministically by wrapping
``_publish_manifest`` so the interleaving under test is exact, the same
model-checker style as tests/test_versioned_props.py's append-retry
suite.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polygon_daily_market_data_pipeline_spark.operators.versioned import (
    commit_version,
    delete_version_keys,
    delete_version_vectors,
    fast_count,
    history,
    read_version,
)


def _df(spark, tag: int, lo: int = 0, n: int = 8):
    return spark.range(lo, lo + n).select(
        F.col("id").cast("long").alias("k"),
        F.lit(tag).cast("long").alias("tag"),
        (F.col("id") * 10 + tag).cast("double").alias("v"),
    )


def _rows(df):
    return sorted((r.k, r.tag, r.v) for r in df.collect())


def _race_once(monkeypatch, V, mode: str, racer):
    """Run ``racer()`` the first time a publish with ``mode`` is
    attempted — the loser's exact publish instant."""
    real = V._publish_manifest
    state = {"raced": False}

    def racing(table_dir, version, manifest):
        if not state["raced"] and manifest["mode"] == mode:
            state["raced"] = True
            racer()
        return real(table_dir, version, manifest)

    monkeypatch.setattr(V, "_publish_manifest", racing)


def test_dv_delete_racing_append_both_commit(spark, tmp_path, monkeypatch):
    """delete_dv loses the race to an append: both land. The delete
    applies to the snapshot it scanned (WriteSerializable — the
    appended rows survive even where they match the predicate), the
    appended rows are intact, and fast_count agrees with the composed
    arithmetic."""
    import polygon_daily_market_data_pipeline_spark.operators.versioned as V

    t = str(tmp_path / "vt")
    commit_version(_df(spark, 0), t, stats_cols=["k"])

    _race_once(
        monkeypatch,
        V,
        "delete_dv",
        lambda: V.commit_version(
            _df(spark, 7, lo=100), t, mode="append", stats_cols=["k"]
        ),
    )
    v = delete_version_vectors(spark, t, F.col("k") < 4)
    assert v == len(history(t)) - 1
    got = _rows(read_version(spark, t))
    want = sorted(
        [r for r in _rows(_df(spark, 0)) if r[0] >= 4]
        + _rows(_df(spark, 7, lo=100))
    )
    assert got == want
    assert fast_count(t) == len(want)


def test_dv_deletes_on_disjoint_files_both_commit(
    spark, tmp_path, monkeypatch
):
    """Two delete_dv commits racing on DISJOINT file sets: the loser
    rebases and both deletions apply. The table is two key-disjoint
    range-partitioned commits, the racer vectors the top half, we
    vector the bottom half — the manifest dv delta proves file
    disjointness."""
    import polygon_daily_market_data_pipeline_spark.operators.versioned as V

    t = str(tmp_path / "vt")
    lo = _df(spark, 0, lo=0, n=8)
    hi = _df(spark, 0, lo=100, n=8)
    commit_version(
        lo.repartitionByRange(2, "k"), t, stats_cols=["k"]
    )
    commit_version(
        hi.repartitionByRange(2, "k"), t, mode="append", stats_cols=["k"]
    )

    _race_once(
        monkeypatch,
        V,
        "delete_dv",
        lambda: V.delete_version_vectors(
            spark, t, F.col("k") >= 104, prune={"k": (104, None)}
        ),
    )
    v = delete_version_vectors(
        spark, t, F.col("k") < 4, prune={"k": (None, 3)}
    )
    assert v == len(history(t)) - 1
    got = _rows(read_version(spark, t))
    want = sorted(
        [r for r in _rows(lo) if r[0] >= 4]
        + [r for r in _rows(hi) if r[0] < 104]
    )
    assert got == want
    assert fast_count(t) == len(want)


def test_dv_deletes_on_same_files_still_refuse(spark, tmp_path, monkeypatch):
    """Two delete_dv commits racing on the SAME file: positions may
    overlap and the per-file cardinalities would lie — the loser must
    refuse even with retries available, naming the clash."""
    import polygon_daily_market_data_pipeline_spark.operators.versioned as V

    t = str(tmp_path / "vt")
    commit_version(_df(spark, 0).coalesce(1), t, stats_cols=["k"])

    _race_once(
        monkeypatch,
        V,
        "delete_dv",
        lambda: V.delete_version_vectors(spark, t, F.col("k") == 6),
    )
    with pytest.raises(FileExistsError, match="SAME files"):
        delete_version_vectors(spark, t, F.col("k") < 4)
    # the racer's delete stands; ours left only vacuumable debris
    assert [r[0] for r in _rows(read_version(spark, t))] == [
        0, 1, 2, 3, 4, 5, 7,
    ]


def test_dv_delete_racing_restructure_refuses(spark, tmp_path, monkeypatch):
    """delete_dv losing to a COMPACTION (any dir-restructuring commit):
    the positions reference pre-compact files — rebasing would vector
    rewritten data. Must refuse."""
    import polygon_daily_market_data_pipeline_spark.operators.versioned as V

    t = str(tmp_path / "vt")
    commit_version(_df(spark, 0).coalesce(1), t, stats_cols=["k"])
    commit_version(
        _df(spark, 1, lo=100).coalesce(1), t, mode="append", stats_cols=["k"]
    )

    _race_once(
        monkeypatch,
        V,
        "delete_dv",
        lambda: V.optimize_compact(
            spark, t, target_bytes=1 << 30, stats_cols=["k"]
        ),
    )
    with pytest.raises(FileExistsError, match="restructured the table"):
        delete_version_vectors(spark, t, F.col("k") < 4)


def test_eqdel_racing_append_scope_is_preserved(
    spark, tmp_path, monkeypatch
):
    """delete_eq loses the race to an append of the SAME keys: both
    land, and the re-appended rows SURVIVE — the erasure scope is
    pinned to the dirs visible when the delete scanned, so the rebase
    cannot widen it onto the racer's commit (the scoping contract that
    makes delete-then-reinsert behave)."""
    import polygon_daily_market_data_pipeline_spark.operators.versioned as V

    t = str(tmp_path / "vt")
    base = _df(spark, 0)
    commit_version(base, t, stats_cols=["k"])
    reinsert = _df(spark, 9, lo=0, n=4)  # same keys 0..3, new tag

    _race_once(
        monkeypatch,
        V,
        "delete_eq",
        lambda: V.commit_version(
            reinsert, t, mode="append", stats_cols=["k"]
        ),
    )
    keys = spark.range(4).select(F.col("id").cast("long").alias("k"))
    v = delete_version_keys(spark, t, keys, ["k"])
    assert v == len(history(t)) - 1
    got = _rows(read_version(spark, t))
    want = sorted(
        [r for r in _rows(base) if r[0] >= 4] + _rows(reinsert)
    )
    assert got == want


def test_eqdel_racing_eqdel_both_commit(spark, tmp_path, monkeypatch):
    """Two equality deletes racing: erasure-list entries always merge
    (each carries its own scope) — both key sets end up deleted."""
    import polygon_daily_market_data_pipeline_spark.operators.versioned as V

    t = str(tmp_path / "vt")
    commit_version(_df(spark, 0), t)

    def racer():
        ks = spark.range(6, 8).select(F.col("id").cast("long").alias("k"))
        V.delete_version_keys(spark, t, ks, ["k"])

    _race_once(monkeypatch, V, "delete_eq", racer)
    keys = spark.range(2).select(F.col("id").cast("long").alias("k"))
    v = delete_version_keys(spark, t, keys, ["k"])
    assert v == len(history(t)) - 1
    assert [r[0] for r in _rows(read_version(spark, t))] == [2, 3, 4, 5]


def test_dv_delete_racing_eqdel_composes(spark, tmp_path, monkeypatch):
    """delete_dv losing to an equality delete: anti-joins compose (a
    row both target is removed once), fast_count declines (eqdel
    present) so no metadata count can lie — rebase and land."""
    import polygon_daily_market_data_pipeline_spark.operators.versioned as V

    t = str(tmp_path / "vt")
    commit_version(_df(spark, 0), t, stats_cols=["k"])

    def racer():
        ks = spark.range(2, 5).select(F.col("id").cast("long").alias("k"))
        V.delete_version_keys(spark, t, ks, ["k"])

    _race_once(monkeypatch, V, "delete_dv", racer)
    v = delete_version_vectors(spark, t, F.col("k") < 4)
    assert v == len(history(t)) - 1
    assert [r[0] for r in _rows(read_version(spark, t))] == [5, 6, 7]
    assert fast_count(t) is None  # eqdel pending: cannot-prove, no lie


def test_update_dv_racing_append_both_commit(spark, tmp_path, monkeypatch):
    """update_dv loses the race to an append: both land. The update
    applies to the snapshot it scanned (appended rows survive
    unmodified even where they match the predicate), matched old rows
    carry the new image, and the appended file stats survive the
    rebase (the manifest merges cur.files with the image dir's)."""
    import polygon_daily_market_data_pipeline_spark.operators.versioned as V
    from polygon_daily_market_data_pipeline_spark.operators.versioned import (
        update_version_vectors,
    )

    t = str(tmp_path / "vt")
    commit_version(_df(spark, 0), t, stats_cols=["k"])

    _race_once(
        monkeypatch,
        V,
        "update_dv",
        lambda: V.commit_version(
            _df(spark, 7, lo=2, n=4), t, mode="append", stats_cols=["k"]
        ),
    )
    v = update_version_vectors(
        spark, t, F.col("k") < 4, {"v": F.lit(-1.0)}, stats_cols=["k"]
    )
    assert v == len(history(t)) - 1
    got = _rows(read_version(spark, t))
    want = sorted(
        [(k, tag, (-1.0 if k < 4 else val)) for k, tag, val in _rows(_df(spark, 0))]
        + _rows(_df(spark, 7, lo=2, n=4))  # racer's rows untouched
    )
    assert got == want
    assert fast_count(t) == len(want)


def test_update_dv_racing_disjoint_dv_delete_both_commit(
    spark, tmp_path, monkeypatch
):
    """update_dv racing a delete_dv on DISJOINT files: both land —
    the dv delta proves no position can double-count."""
    import polygon_daily_market_data_pipeline_spark.operators.versioned as V
    from polygon_daily_market_data_pipeline_spark.operators.versioned import (
        update_version_vectors,
    )

    t = str(tmp_path / "vt")
    commit_version(
        _df(spark, 0, lo=0, n=8).repartitionByRange(2, "k"),
        t, stats_cols=["k"],
    )
    commit_version(
        _df(spark, 0, lo=100, n=8).repartitionByRange(2, "k"),
        t, mode="append", stats_cols=["k"],
    )

    def racer():
        V.delete_version_vectors(
            spark, t, F.col("k") >= 100, prune={"k": (100, None)}
        )

    _race_once(monkeypatch, V, "update_dv", racer)
    v = update_version_vectors(
        spark, t, F.col("k") < 4, {"v": F.lit(-2.0)},
        prune={"k": (None, 7)},
    )
    assert v == len(history(t)) - 1
    got = _rows(read_version(spark, t))
    want = sorted(
        (k, tag, (-2.0 if k < 4 else val))
        for k, tag, val in _rows(_df(spark, 0, lo=0, n=8))
    )
    assert got == want


def test_update_dv_racing_eqdel_refuses(spark, tmp_path, monkeypatch):
    """update_dv racing an equality delete must REFUSE: rebasing the
    update past the eqdel would resurrect the erased keys as fresh
    images (the appended image dir postdates the eqdel's pinned
    scope). The image dir it wrote is debris for vacuum."""
    import polygon_daily_market_data_pipeline_spark.operators.versioned as V
    from polygon_daily_market_data_pipeline_spark.operators.versioned import (
        update_version_vectors,
        vacuum,
    )

    t = str(tmp_path / "vt")
    commit_version(_df(spark, 0), t, stats_cols=["k"])

    def racer():
        ks = spark.range(2).select(F.col("id").cast("long").alias("k"))
        V.delete_version_keys(spark, t, ks, ["k"])

    _race_once(monkeypatch, V, "update_dv", racer)
    with pytest.raises(FileExistsError, match="delete_eq"):
        update_version_vectors(spark, t, F.col("k") < 4, {"v": F.lit(-1.0)})
    # the winner's state is intact; the loser's artifacts are sweepable
    assert [r[0] for r in _rows(read_version(spark, t))] == list(range(2, 8))
    vacuum(t, keep_last=1)
    assert [r[0] for r in _rows(read_version(spark, t))] == list(range(2, 8))


def test_dv_delete_racing_add_check_rebases(spark, tmp_path, monkeypatch):
    """delete_dv losing to a concurrent add_check rebases and lands —
    removing rows cannot violate a constraint — while update_dv racing
    the same commit refuses (its images were never validated against
    the new set)."""
    import polygon_daily_market_data_pipeline_spark.operators.versioned as V
    from polygon_daily_market_data_pipeline_spark.operators.versioned import (
        add_check,
        update_version_vectors,
    )

    t = str(tmp_path / "vt")
    commit_version(_df(spark, 0), t, stats_cols=["k"])

    _race_once(
        monkeypatch, V, "delete_dv",
        lambda: add_check(spark, t, "v_ok", "v >= 0"),
    )
    v = delete_version_vectors(spark, t, F.col("k") < 2)
    assert v == len(history(t)) - 1
    assert [r[0] for r in _rows(read_version(spark, t))] == list(range(2, 8))

    _race_once(
        monkeypatch, V, "update_dv",
        lambda: add_check(spark, t, "v_cap", "v < 1e9"),
    )
    with pytest.raises(FileExistsError, match="add_check"):
        update_version_vectors(spark, t, F.col("k") == 5, {"v": F.lit(1.0)})
