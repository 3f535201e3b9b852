"""Data skipping on versioned tables: manifest-recorded per-file
[min, max] envelopes (operators/versioned.py stats_cols / scan_version)
must (a) be value-exact — scan_version(preds) ≡
read_version().where(preds) — and (b) actually shrink the scheduled
file list, which is the whole point: Spark's own parquet footer
skipping runs per already-scheduled task, while the manifest prune
happens before any task exists.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from polygon_daily_market_data_pipeline_spark.operators.versioned import (
    _resolve_manifest,
    commit_version,
    optimize_zorder,
    prune_files,
    read_version,
    rollback,
    scan_version,
)

N_FILES = 16


def _events(spark, n=4000, tag=0):
    """id-clustered frame written as N_FILES range-partitioned files, so
    per-file id envelopes are tight and a narrow id predicate should
    prune most files."""
    return (
        spark.range(n)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 7).alias("grp"),
            F.lit(tag).alias("tag"),
            (F.col("id").cast("double") / 100).alias("v"),
            F.to_timestamp(
                F.lit("2024-01-01 00:00:00") # anchor
            ).alias("base_ts"),
        )
        .withColumn("ts", F.col("base_ts") + F.make_interval(mins=F.col("k")))
        .drop("base_ts")
        .repartitionByRange(N_FILES, "k")
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_scan_equals_read_filter_and_prunes(spark, tmp_path):
    t = str(tmp_path / "vt")
    commit_version(_events(spark), t, stats_cols=["k", "ts"])
    preds = {"k": (100, 299)}
    got = scan_version(spark, t, preds)
    want = read_version(spark, t).where(F.col("k").between(100, 299))
    assert _rows(got) == _rows(want)
    # a 5% range must not schedule all files
    kept, total = prune_files(t, _resolve_manifest(t), preds)
    assert total == N_FILES
    assert len(kept) <= 3, (len(kept), total)
    assert len(got.inputFiles()) == len(kept)


def test_timestamp_predicate_prunes(spark, tmp_path):
    t = str(tmp_path / "vt")
    commit_version(_events(spark), t, stats_cols=["k", "ts"])
    lo = dt.datetime(2024, 1, 1, 1, 0)
    hi = dt.datetime(2024, 1, 1, 3, 0)  # minutes 60..180 of 4000
    got = scan_version(spark, t, {"ts": (lo, hi)})
    want = read_version(spark, t).where(F.col("ts").between(F.lit(lo), F.lit(hi)))
    assert _rows(got) == _rows(want)
    kept, total = prune_files(t, _resolve_manifest(t), {"ts": (lo, hi)})
    assert len(kept) < total


def test_open_ended_bounds(spark, tmp_path):
    t = str(tmp_path / "vt")
    commit_version(_events(spark), t, stats_cols=["k"])
    got = scan_version(spark, t, {"k": (3800, None)})
    want = read_version(spark, t).where(F.col("k") >= 3800)
    assert _rows(got) == _rows(want)
    kept, total = prune_files(t, _resolve_manifest(t), {"k": (3800, None)})
    assert len(kept) <= 2 < total


def test_append_carries_stats_and_unstatted_files_stay(spark, tmp_path):
    """Append commits merge file stats; a commit made WITHOUT stats
    leaves its files unprunable (always scanned) but never wrong."""
    t = str(tmp_path / "vt")
    commit_version(_events(spark, n=1000, tag=0), t, stats_cols=["k"])
    commit_version(
        _events(spark, n=1000, tag=1), t, mode="append"
    )  # no stats
    commit_version(
        _events(spark, n=1000, tag=2), t, mode="append", stats_cols=["k"]
    )
    preds = {"k": (0, 59)}
    got = scan_version(spark, t, preds)
    want = read_version(spark, t).where(F.col("k").between(0, 59))
    assert _rows(got) == _rows(want)
    kept, total = prune_files(t, _resolve_manifest(t), preds)
    # tag-1's 16 files all survive (no stats); tag-0/tag-2 prune to ~1 each
    assert total == 3 * N_FILES
    assert N_FILES < len(kept) <= N_FILES + 4


def test_all_files_pruned_returns_empty_with_schema(spark, tmp_path):
    t = str(tmp_path / "vt")
    commit_version(_events(spark, n=500), t, stats_cols=["k"])
    got = scan_version(spark, t, {"k": (10_000, 20_000)})
    assert got.count() == 0
    assert got.columns == read_version(spark, t).columns


def test_zorder_conjunctive_prune_and_rollback_keeps_stats(spark, tmp_path):
    """optimize_zorder indexes its z-columns by default; a conjunctive
    two-column range predicate prunes on BOTH, and a rollback to the
    optimized version carries the stats (its visibility set is the
    optimized files)."""
    t = str(tmp_path / "vt")
    df = _events(spark, n=4000)
    commit_version(df, t)
    v1 = optimize_zorder(spark, t, ["k", "grp"], n_files=N_FILES, bits=8)
    preds = {"k": (0, 399), "grp": (2, 3)}
    got = scan_version(spark, t, preds, version=v1)
    want = (
        read_version(spark, t, version=v1)
        .where(F.col("k").between(0, 399) & F.col("grp").between(2, 3))
    )
    assert _rows(got) == _rows(want)
    kept, total = prune_files(t, _resolve_manifest(t, version=v1), preds)
    assert len(kept) < total
    # rollback publishes a new version with the optimized stats intact
    commit_version(_events(spark, n=10, tag=9), t)  # move the table on
    v3 = rollback(t, v1)
    kept3, total3 = prune_files(t, _resolve_manifest(t, version=v3), preds)
    assert (len(kept3), total3) == (len(kept), total)
    assert _rows(scan_version(spark, t, preds, version=v3)) == _rows(want)


def test_scan_equals_read_filter_property(spark, tmp_path):
    """Property: for ANY layout (files × distribution) and ANY
    conjunctive range predicate — including empty ranges, full ranges,
    and open bounds — scan_version is value-identical to
    read_version().where(...). Seeded exhaustive sweep instead of
    hypothesis: one Spark commit per layout is the expensive part, so
    reuse each table across many predicates."""
    import random

    for seed in range(3):
        rng = random.Random(seed)
        n_files = rng.choice([1, 4, 9])
        n = rng.randrange(50, 400)
        t = str(tmp_path / f"vt_{seed}")
        rows = [
            (rng.randrange(-50, 1000), rng.choice("abcde"), rng.random())
            for _ in range(n)
        ]
        df = spark.createDataFrame(rows, "k long, s string, v double")
        # half the layouts cluster on k (prunable), half are random
        df = (
            df.repartitionByRange(n_files, "k")
            if seed % 2
            else df.repartition(n_files)
        )
        commit_version(df, t, stats_cols=["k", "s"])
        for _ in range(8):
            lo = rng.choice([None, rng.randrange(-100, 1100)])
            hi = rng.choice([None, rng.randrange(-100, 1100)])
            preds = {"k": (lo, hi)}
            if rng.random() < 0.5:
                a, b = sorted(rng.choice("abcdef") for _ in range(2))
                preds["s"] = (a, b)
            got = scan_version(spark, t, preds)
            want = read_version(spark, t)
            for col, (plo, phi) in preds.items():
                if plo is not None:
                    want = want.where(F.col(col) >= plo)
                if phi is not None:
                    want = want.where(F.col(col) <= phi)
            assert _rows(got) == _rows(want), (seed, preds)


def test_naive_timestamp_bounds_unaffected_by_session_tz(spark, tmp_path):
    """PySpark's F.lit(datetime) interprets a NAIVE datetime in the
    driver PROCESS time zone, independent of spark.sql.session.timeZone
    — so flipping the session TZ must change neither the residual
    filter nor the prune decision, and scan_version stays value-exact
    vs read_version().where() (confusing the two zones was the round-6
    ADVICE hazard: a shifted envelope comparison silently drops files
    whose rows the filter keeps)."""
    t = str(tmp_path / "vt")
    commit_version(_events(spark), t, stats_cols=["k", "ts"])
    before = spark.conf.get("spark.sql.session.timeZone")
    lo = dt.datetime(2024, 1, 1, 2, 0)  # naive → process-TZ semantics
    hi = dt.datetime(2024, 1, 1, 12, 0)
    try:
        results = {}
        for tz in ("UTC", "America/New_York"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            got = scan_version(spark, t, {"ts": (lo, hi)})
            want = read_version(spark, t).where(
                F.col("ts").between(F.lit(lo), F.lit(hi))
            )
            assert _rows(got) == _rows(want), tz
            assert got.count() > 0, tz
            results[tz] = _rows(got)
        assert results["UTC"] == results["America/New_York"]
        kept, total = prune_files(t, _resolve_manifest(t), {"ts": (lo, hi)})
        assert 0 < len(kept) < total
    finally:
        spark.conf.set("spark.sql.session.timeZone", before)


def test_naive_bound_normalization_explicit_tz():
    """_norm_bound with an explicit zone: NY winter noon → 17:00Z; the
    DST folds of an ambiguous local time (2024-11-03 01:30 EDT/EST)
    bracket outward — lo takes the earlier instant, hi the later — so a
    too-tight bound can never drop a matching file at a DST edge;
    tz-aware bounds convert exactly."""
    from zoneinfo import ZoneInfo

    from polygon_daily_market_data_pipeline_spark.operators.versioned import (
        _norm_bound,
    )

    ny = ZoneInfo("America/New_York")
    assert _norm_bound(dt.datetime(2024, 1, 1, 12, 0), "lo", ny) == dt.datetime(
        2024, 1, 1, 17, 0
    )
    amb = dt.datetime(2024, 11, 3, 1, 30)  # falls twice in NY
    assert _norm_bound(amb, "lo", ny) == dt.datetime(2024, 11, 3, 5, 30)
    assert _norm_bound(amb, "hi", ny) == dt.datetime(2024, 11, 3, 6, 30)
    aware = dt.datetime(2024, 1, 1, 12, 0, tzinfo=ZoneInfo("Asia/Tokyo"))
    assert _norm_bound(aware, "lo", None) == dt.datetime(2024, 1, 1, 3, 0)


def test_prune_bound_type_mismatch_keeps_files(spark, tmp_path):
    """A bound/stat type mismatch (datetime bound vs DATE-column stats
    — a TypeError in Python) must keep the file and let the residual
    Spark filter decide, not crash: 'cannot prune is never wrong'."""
    t = str(tmp_path / "vt")
    df = _events(spark, n=500).withColumn("d", F.to_date("ts"))
    commit_version(df, t, stats_cols=["d"])
    bound = dt.datetime(2024, 1, 1, 3, 0)
    preds = {"d": (bound, None)}
    kept, total = prune_files(t, _resolve_manifest(t), preds)
    assert len(kept) == total  # incomparable: nothing pruned, no crash
    got = scan_version(spark, t, preds)
    want = read_version(spark, t).where(F.col("d") >= F.lit(bound))
    assert _rows(got) == _rows(want)


def test_scan_version_with_stats_reports_plan_truth(spark, tmp_path):
    """scan_version_with_stats returns the prune decision as a value
    (not a DataFrame attribute, which dies on the first transformation);
    the decision must agree with the plan's actual file list."""
    from polygon_daily_market_data_pipeline_spark.operators.versioned import (
        scan_version_with_stats,
    )

    t = str(tmp_path / "vt")
    commit_version(_events(spark), t, stats_cols=["k"])
    df, stats = scan_version_with_stats(spark, t, {"k": (0, 249)})
    assert stats.files_total == N_FILES
    assert 0 < stats.files_scheduled < N_FILES
    assert len(df.inputFiles()) == stats.files_scheduled
    # stats survive further transformations trivially — they're a value
    assert df.where(F.col("grp") == 0).count() > 0


def test_binary_column_stats_are_not_indexed(spark, tmp_path):
    """Footer stats on a BINARY column must not be recorded: decoding
    bytes to str (errors='replace') would distort non-UTF8 envelopes
    and change the collation the comparison runs under — the column
    records no stats and stays unprunable, while other indexed columns
    still prune, and results stay value-exact."""
    t = str(tmp_path / "vt")
    df = _events(spark, n=400).withColumn(
        "blob", F.encode(F.concat(F.lit("\xff\x00x"), F.col("k")), "ISO-8859-1")
    )
    commit_version(df, t, stats_cols=["k", "blob"])
    m = _resolve_manifest(t)
    assert all(
        ent["stats"]["blob"] is None
        for ent in m["files"].values()
        if ent["stats"] is not None
    )
    # binary-bounded predicate: keeps every file, never crashes
    kept, total = prune_files(t, m, {"blob": (b"\x00", None)})
    assert len(kept) == total
    # ...and the k predicate alongside still prunes, value-exact
    got = scan_version(spark, t, {"k": (0, 49)})
    want = read_version(spark, t).where(F.col("k").between(0, 49))
    assert _rows(got) == _rows(want)
    kept2, _ = prune_files(t, m, {"k": (0, 49)})
    assert len(kept2) < total


def test_null_count_skipping(spark, tmp_path):
    """IS NULL / IS NOT NULL pruning from per-file null counts (round
    12 — the skip [min,max] envelopes cannot express it): a sparse
    optional column's 'not_null' scan schedules only the files that
    recorded any value, 'null' only the files with NULLs, a mixed file
    survives both, and every result is value-identical to the
    unpruned read + residual filter."""
    from pyspark.sql import functions as F

    from polygon_daily_market_data_pipeline_spark.operators.versioned import (
        commit_version,
        read_version,
        scan_version_with_stats,
    )
    from polygon_daily_market_data_pipeline_spark.sources.tables import load_table

    base = (
        load_table(spark, "/root/testdata/sf0.001", "orders")
        .where(F.col("o_custkey") % 4 == 1)
        .select("o_orderkey", "o_totalprice")
    )
    tdir = str(tmp_path / "vt")
    # file era 1: o_note entirely NULL; era 2: entirely non-NULL;
    # era 3: mixed (every 3rd row NULL)
    all_null = base.withColumn("o_note", F.lit(None).cast("string"))
    non_null = base.withColumn(
        "o_note", F.concat(F.lit("n"), F.col("o_orderkey").cast("string"))
    )
    mixed = base.withColumn(
        "o_note",
        F.when(F.col("o_orderkey") % 3 == 0, None).otherwise(F.lit("m")),
    )
    # o_note must be in stats_cols: null counts ride the same manifest
    # entries as the envelopes (an all-NULL file records counts but no
    # envelope — has_min_max is false, has_null_count is true)
    cols = ["o_orderkey", "o_note"]
    commit_version(all_null.repartition(2), tdir, stats_cols=cols)
    commit_version(
        non_null.repartition(2), tdir, mode="append", stats_cols=cols
    )
    commit_version(
        mixed.repartition(2), tdir, mode="append", stats_cols=cols
    )
    full = read_version(spark, tdir)

    got_nn, st_nn = scan_version_with_stats(
        spark, tdir, {}, null_filter={"o_note": "not_null"}
    )
    assert st_nn.files_total == 6
    assert st_nn.files_scheduled == 4  # era-1's two all-NULL files pruned
    assert got_nn.count() == full.where(F.col("o_note").isNotNull()).count()

    got_n, st_n = scan_version_with_stats(
        spark, tdir, {}, null_filter={"o_note": "null"}
    )
    assert st_n.files_scheduled == 4  # era-2's two zero-NULL files pruned
    assert got_n.count() == full.where(F.col("o_note").isNull()).count()

    # composes with range pruning: not_null + a key range touching only
    # era boundaries still returns the exact residual-filtered rows
    hi = base.agg(F.max("o_orderkey")).first()[0] // 2
    got_c, _st = scan_version_with_stats(
        spark, tdir, {"o_orderkey": (None, hi)},
        null_filter={"o_note": "not_null"},
    )
    want = full.where(
        (F.col("o_orderkey") <= hi) & F.col("o_note").isNotNull()
    )
    assert sorted(map(tuple, got_c.collect())) == sorted(map(tuple, want.collect()))

    import pytest as _pytest

    with _pytest.raises(ValueError, match="null_preds"):
        scan_version_with_stats(
            spark, tdir, {}, null_filter={"o_note": "bogus"}
        )


# ---- IN-list pruning (round 13: scan_version(in_filter=...)) ----


def test_in_filter_prunes_and_is_exact(spark, tmp_path):
    t = str(tmp_path / "vt_in")
    commit_version(_events(spark), t, stats_cols=["k"])
    from polygon_daily_market_data_pipeline_spark.operators.versioned import (
        scan_version_with_stats,
    )

    keys = [5, 1003, 3999]
    scan, stats = scan_version_with_stats(spark, t, {}, in_filter={"k": keys})
    assert _rows(scan) == _rows(read_version(spark, t).where(F.col("k").isin(keys)))
    # three keys land in at most three of the 16 range-partitioned files
    assert stats.files_scheduled <= 3 < stats.files_total == N_FILES
    assert len(scan.inputFiles()) == stats.files_scheduled


def test_in_filter_empty_list_matches_nothing(spark, tmp_path):
    t = str(tmp_path / "vt_in_empty")
    commit_version(_events(spark, n=400), t, stats_cols=["k"])
    from polygon_daily_market_data_pipeline_spark.operators.versioned import (
        scan_version_with_stats,
    )

    scan, stats = scan_version_with_stats(spark, t, {}, in_filter={"k": []})
    assert scan.count() == 0
    assert stats.files_scheduled == 0
    # schema survives the nothing-matches path
    assert "grp" in scan.columns


def test_in_filter_null_member_raises(spark, tmp_path):
    t = str(tmp_path / "vt_in_null")
    commit_version(_events(spark, n=100), t, stats_cols=["k"])
    import pytest

    with pytest.raises(ValueError, match="IS NULL"):
        scan_version(spark, t, {}, in_filter={"k": [1, None]})


def test_in_filter_bloom_prunes_unclustered_column(spark, tmp_path):
    """Envelopes cannot prune a hash-valued column (every file's
    [min, max] spans the domain); the sidecar bloom must."""
    t = str(tmp_path / "vt_in_bloom")
    df = _events(spark, n=4000).withColumn(
        "s", F.md5(F.col("k").cast("string"))
    )
    commit_version(df, t, stats_cols=["k", "s"], bloom_cols=["s"])
    target = (
        read_version(spark, t).where(F.col("k") == 123).select("s").first()[0]
    )
    from polygon_daily_market_data_pipeline_spark.operators.versioned import (
        scan_version_with_stats,
    )

    vals = [target, "0" * 32]  # one present, one absent
    scan, stats = scan_version_with_stats(spark, t, {}, in_filter={"s": vals})
    assert _rows(scan) == _rows(
        read_version(spark, t).where(F.col("s").isin(vals))
    )
    assert scan.count() == 1
    # the absent value prunes everywhere it is provably absent; the
    # present value keeps exactly its file (modulo bloom fpp)
    assert stats.files_scheduled < stats.files_total


def test_in_filter_composes_with_range_predicate(spark, tmp_path):
    t = str(tmp_path / "vt_in_range")
    commit_version(_events(spark), t, stats_cols=["k"])
    from polygon_daily_market_data_pipeline_spark.operators.versioned import (
        scan_version_with_stats,
    )

    keys = [5, 1003, 3999]
    scan, stats = scan_version_with_stats(
        spark, t, {"k": (None, 2000)}, in_filter={"k": keys}
    )
    expect = read_version(spark, t).where(
        (F.col("k") <= 2000) & F.col("k").isin(keys)
    )
    assert _rows(scan) == _rows(expect)
    # both prunes apply: 3999's file is cut by the range, 1003/5 remain
    assert stats.files_scheduled <= 2


def test_in_filter_type_mismatch_cannot_prune_but_stays_exact(spark, tmp_path):
    t = str(tmp_path / "vt_in_mismatch")
    df = _events(spark, n=800).withColumn(
        "s", F.md5(F.col("k").cast("string"))
    )
    commit_version(df, t, stats_cols=["s"], bloom_cols=["s"])
    from polygon_daily_market_data_pipeline_spark.operators.versioned import (
        scan_version_with_stats,
    )

    # integer members against string stats: envelopes and blooms both
    # refuse to prune (cannot-prove), the residual filter decides
    scan, stats = scan_version_with_stats(spark, t, {}, in_filter={"s": [5]})
    assert stats.files_scheduled == stats.files_total
    assert scan.count() == 0


# ---- property law: IN-list pruning never changes results ----

import pytest as _pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as _st

_IN_TABLE = {}


@_pytest.fixture()
def in_prop_table(spark, tmp_path_factory):
    # ONE committed layout shared by every hypothesis example (the
    # commit is the expensive part; the law varies only the key list)
    if "t" not in _IN_TABLE:
        t = str(tmp_path_factory.mktemp("inprop") / "vt")
        commit_version(
            _events(spark, n=4000).withColumn(
                "s", F.md5(F.col("k").cast("string"))
            ),
            t,
            stats_cols=["k", "s"],
            bloom_cols=["s"],
        )
        _IN_TABLE["t"] = t
    return _IN_TABLE["t"]


@settings(
    max_examples=12,
    deadline=None,
    # the fixture is a deliberately SHARED immutable committed layout
    # (committing per example would dominate runtime); examples only
    # read it
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(keys=_st.lists(_st.integers(-100, 4200), max_size=7))
def test_in_filter_prune_value_identity_property(spark, in_prop_table, keys):
    """For ANY key list (hits, misses, out-of-range, empty, dupes) the
    pruned scan is value-identical to the unpruned residual read and
    never schedules more files than the table has."""
    from polygon_daily_market_data_pipeline_spark.operators.versioned import (
        scan_version_with_stats,
    )

    scan, stats = scan_version_with_stats(
        spark, in_prop_table, {}, in_filter={"k": keys}
    )
    expect = read_version(spark, in_prop_table).where(
        F.col("k").isin(keys) if keys else F.lit(False)
    )
    assert _rows(scan) == _rows(expect)
    assert 0 <= stats.files_scheduled <= stats.files_total
    in_range = {v for v in keys if 0 <= v < 4000}
    # every in-range key lands in at most one range-partitioned file
    assert stats.files_scheduled <= max(len(in_range), 0) or not keys
