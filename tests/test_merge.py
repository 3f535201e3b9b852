"""Unit tests: MERGE semantics fidelity (SURVEY §7.3.1) — matched-update,
not-matched-insert, carryover, duplicate-source dedup precondition,
insert-only merge, deterministic surrogate keys, W1 tie-breaks."""

from __future__ import annotations

from pyspark.sql import functions as F

from polygon_daily_market_data_pipeline_spark.operators.dedupe import latest_by_key
from polygon_daily_market_data_pipeline_spark.operators.merge import (
    assign_surrogate_keys,
    insert_only_merge,
    merge_upsert,
)


def test_merge_upsert_branches(spark):
    target = spark.createDataFrame(
        [("A", 1, "old"), ("B", 2, "old")], "k string, v int, tag string"
    )
    source = spark.createDataFrame(
        [("B", 20, "new"), ("C", 30, "new")], "k string, v int, tag string"
    )
    out = {
        r["k"]: r for r in merge_upsert(target, source, keys=["k"]).collect()
    }
    assert len(out) == 3
    assert out["A"]["v"] == 1 and out["A"]["tag"] == "old"   # carryover
    assert out["B"]["v"] == 20 and out["B"]["tag"] == "new"  # matched update
    assert out["C"]["v"] == 30                               # insert


def test_merge_upsert_partial_update_cols(spark):
    target = spark.createDataFrame([("A", 1, "keep")], "k string, v int, note string")
    source = spark.createDataFrame([("A", 9, "clobber")], "k string, v int, note string")
    row = merge_upsert(target, source, keys=["k"], update_cols=["v"]).collect()[0]
    assert row["v"] == 9 and row["note"] == "keep"


def test_merge_upsert_rerun_converges(spark):
    """Replaying the same source is a no-op (idempotency §5.1.3)."""
    target = spark.createDataFrame([("A", 1)], "k string, v int")
    source = spark.createDataFrame([("A", 5), ("B", 7)], "k string, v int")
    once = merge_upsert(target, source, keys=["k"])
    twice = merge_upsert(once, source, keys=["k"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_insert_only_merge_never_updates(spark):
    dim = spark.createDataFrame([(1, "AAPL")], "id long, symbol string")
    src = spark.createDataFrame(
        [(99, "AAPL"), (2, "MSFT"), (2, "MSFT")], "id long, symbol string"
    )
    out = {r["symbol"]: r["id"] for r in insert_only_merge(dim, src, keys=["symbol"]).collect()}
    assert out["AAPL"] == 1  # existing row untouched despite source id=99
    assert out["MSFT"] == 2 and len(out) == 2  # source deduped


def test_surrogate_keys_deterministic(spark):
    new = spark.createDataFrame([("Z",), ("A",), ("M",)], "symbol string")
    ids = {
        r["symbol"]: r["sid"]
        for r in assign_surrogate_keys(new, "symbol", "sid", existing_max=10).collect()
    }
    assert ids == {"A": 11, "M": 12, "Z": 13}  # rank order, offset by max


def test_latest_by_key_tiebreak(spark):
    """W1: _INGEST_TS DESC then _SRC_FILE DESC (merge_core.sql:15)."""
    df = spark.createDataFrame(
        [
            ("AAPL", "2024-01-05", 1.0, 100, "f1"),
            ("AAPL", "2024-01-05", 2.0, 200, "f2"),  # same ts, later file
            ("AAPL", "2024-01-05", 3.0, 100, "f0"),  # earlier ts
            ("MSFT", "2024-01-05", 9.0, 100, "f1"),
        ],
        "symbol string, d string, close double, ts long, src string",
    )
    out = {
        r["symbol"]: r["close"]
        for r in latest_by_key(
            df, keys=["symbol", "d"], order_by=[F.desc("ts"), F.desc("src")]
        ).collect()
    }
    assert out == {"AAPL": 2.0, "MSFT": 9.0}


# ---------------------------------------------------------------------------
# Property-based checks (hypothesis): algebraic laws of the keyed merge
# on arbitrary key/value multisets.
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st

kv_lists = st.lists(
    st.tuples(st.integers(0, 8), st.integers(-5, 5)), max_size=12
)


def _df(spark, rows):
    return spark.createDataFrame(
        [(k, v) for k, v in rows] or [(None, None)], "k int, v int"
    ).where("k is not null")


def _dedup_last(rows):
    out = {}
    for k, v in rows:
        out[k] = v
    return out


@settings(max_examples=12, deadline=None)
@given(t=kv_lists, s=kv_lists)
def test_merge_upsert_model(spark, t, s):
    """merge(target, dedup(source)) == model: source value wins on
    matched keys, both sides' unmatched rows survive, key-unique."""
    tgt = _df(spark, list(_dedup_last(t).items()))
    src = _df(spark, list(_dedup_last(s).items()))
    from polygon_daily_market_data_pipeline_spark.operators.merge import merge_upsert

    got = {(r.k, r.v) for r in merge_upsert(tgt, src, ["k"]).collect()}
    model = dict(_dedup_last(t))
    model.update(_dedup_last(s))
    assert got == set(model.items())


@settings(max_examples=12, deadline=None)
@given(t=kv_lists, s=kv_lists)
def test_merge_upsert_idempotent(spark, t, s):
    """Replaying the same source converges (the FORCE=TRUE property)."""
    tgt = _df(spark, list(_dedup_last(t).items()))
    src = _df(spark, list(_dedup_last(s).items()))
    from polygon_daily_market_data_pipeline_spark.operators.merge import merge_upsert

    once = merge_upsert(tgt, src, ["k"])
    twice = merge_upsert(once, src, ["k"])
    assert sorted(once.collect()) == sorted(twice.collect())


@settings(max_examples=12, deadline=None)
@given(t=kv_lists, s=kv_lists)
def test_insert_only_merge_never_mutates(spark, t, s):
    """Grow-only law: existing values survive any source; new keys join."""
    tgt = _df(spark, list(_dedup_last(t).items()))
    src = _df(spark, s)
    from polygon_daily_market_data_pipeline_spark.operators.merge import (
        insert_only_merge,
    )

    got = {r.k: r.v for r in insert_only_merge(tgt, src, ["k"]).collect()}
    for k, v in _dedup_last(t).items():
        assert got[k] == v  # never updated
    assert set(got) == set(_dedup_last(t)) | {k for k, _ in s}


def test_merge_upsert_null_key_matched_update(spark):
    """A legitimately-NULL source key null-safe-matches a NULL-keyed
    target row and must take the UPDATE branch (source values win) —
    presence is signalled by an explicit marker, never inferred from
    key nullability."""
    target = spark.createDataFrame(
        [(None, 1, "old"), ("A", 2, "old")], "k string, v int, tag string"
    )
    source = spark.createDataFrame(
        [(None, 10, "new")], "k string, v int, tag string"
    )
    out = merge_upsert(target, source, keys=["k"]).collect()
    assert len(out) == 2  # matched, not inserted as a third row
    by_key = {r["k"]: r for r in out}
    assert by_key[None]["v"] == 10 and by_key[None]["tag"] == "new"
    assert by_key["A"]["v"] == 2 and by_key["A"]["tag"] == "old"


def test_scd2_merge_history_and_asof(spark):
    """Type-2 dimension maintenance: changed attributes close the
    current row and open a new version, unchanged keys keep their
    original valid_from, new keys insert, absent keys persist (no
    implicit deletes), closed history is immutable — and as_of()
    reconstructs any past snapshot."""
    import datetime as dt

    from polygon_daily_market_data_pipeline_spark.operators.scd import (
        as_of,
        scd2_init,
        scd2_merge,
    )

    t0, t1, t2 = (dt.datetime(2024, 1, d, 0, 0) for d in (1, 5, 9))
    snap = lambda rows, t: spark.createDataFrame(  # noqa: E731
        [(k, sector, t) for k, sector in rows],
        "symbol string, sector string, eff timestamp",
    )

    dim = scd2_init(snap([("AAA", "tech"), ("BBB", "energy")], t0), ["symbol"], "eff")
    # day 5: AAA changes sector, CCC appears, BBB absent from the batch
    dim = scd2_merge(
        dim, snap([("AAA", "fintech"), ("CCC", "materials")], t1),
        ["symbol"], ["sector"], "eff",
    )
    # day 9: AAA unchanged (must NOT open a new version), BBB changes
    dim = scd2_merge(
        dim, snap([("AAA", "fintech"), ("BBB", "utilities")], t2),
        ["symbol"], ["sector"], "eff",
    )

    rows = {(r.symbol, r.sector): r for r in dim.collect()}
    assert len(rows) == 5  # AAA×2, BBB×2, CCC×1
    aaa_old, aaa_new = rows[("AAA", "tech")], rows[("AAA", "fintech")]
    assert not aaa_old.is_current and aaa_old.valid_to == t1
    assert aaa_new.is_current and aaa_new.valid_from == t1
    bbb_old, bbb_new = rows[("BBB", "energy")], rows[("BBB", "utilities")]
    assert not bbb_old.is_current and bbb_old.valid_to == t2
    assert bbb_new.is_current and bbb_new.valid_from == t2
    assert rows[("CCC", "materials")].is_current

    # unchanged AAA kept its day-5 valid_from through the day-9 merge
    assert aaa_new.valid_from == t1

    # point-in-time snapshots
    day3 = {(r.symbol, r.sector) for r in as_of(dim, dt.datetime(2024, 1, 3)).collect()}
    assert day3 == {("AAA", "tech"), ("BBB", "energy")}
    day7 = {(r.symbol, r.sector) for r in as_of(dim, dt.datetime(2024, 1, 7)).collect()}
    assert day7 == {("AAA", "fintech"), ("BBB", "energy"), ("CCC", "materials")}


def test_scd2_null_business_key(spark):
    """A legitimately-NULL business key versions like any other key —
    presence comes from markers, never key nullability (the null-safety
    contract shared with merge_upsert)."""
    import datetime as dt

    from polygon_daily_market_data_pipeline_spark.operators.scd import (
        scd2_init,
        scd2_merge,
    )

    t0, t1 = dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 5)
    mk = lambda rows, t: spark.createDataFrame(  # noqa: E731
        [(k, s, t) for k, s in rows], "symbol string, sector string, eff timestamp"
    )
    dim = scd2_init(mk([(None, "unknown"), ("AAA", "tech")], t0), ["symbol"], "eff")
    dim = scd2_merge(dim, mk([(None, "misc")], t1), ["symbol"], ["sector"], "eff")
    rows = {(r.symbol, r.sector): r for r in dim.collect()}
    assert len(rows) == 3  # NULL×2 versions + AAA untouched
    assert not rows[(None, "unknown")].is_current
    assert rows[(None, "unknown")].valid_to == t1
    assert rows[(None, "misc")].is_current
    assert rows[("AAA", "tech")].is_current


# ---------------------------------------------------------------------------
# Property-based SCD2 laws: after ANY sequence of snapshot merges,
# (1) exactly one current row per live key, (2) versions of a key tile
# time without overlap (each close is the next open), (3) the current
# attribute equals the model's latest value, (4) history is append-only
# (version count never decreases).
# ---------------------------------------------------------------------------

snapshots = st.lists(
    st.lists(st.tuples(st.integers(0, 4), st.integers(0, 3)), min_size=1, max_size=5),
    min_size=1,
    max_size=4,
)


@settings(max_examples=10, deadline=None)
@given(snaps=snapshots)
def test_scd2_properties(spark, snaps):
    import datetime as dt

    from polygon_daily_market_data_pipeline_spark.operators.scd import (
        OPEN_END,
        scd2_init,
        scd2_merge,
    )

    def df(rows, t):
        dedup = {k: v for k, v in rows}  # one row per key per snapshot
        return spark.createDataFrame(
            [(k, f"s{v}", t) for k, v in dedup.items()],
            "key int, attr string, eff timestamp",
        )

    t = dt.datetime(2024, 1, 1)
    dim = scd2_init(df(snaps[0], t), ["key"], "eff")
    model = {k: f"s{v}" for k, v in {k: v for k, v in snaps[0]}.items()}
    prev_versions = 0
    for i, snap in enumerate(snaps[1:], start=1):
        t_i = t + dt.timedelta(days=i)
        dim = scd2_merge(dim, df(snap, t_i), ["key"], ["attr"], "eff")
        for k, v in {k: v for k, v in snap}.items():
            model[k] = f"s{v}"
        rows = dim.collect()
        assert len(rows) >= prev_versions  # append-only
        prev_versions = len(rows)

        by_key: dict = {}
        for r in rows:
            by_key.setdefault(r.key, []).append(r)
        for k, versions in by_key.items():
            current = [r for r in versions if r.is_current]
            assert len(current) == 1, (k, versions)
            assert current[0].valid_to == OPEN_END
            assert current[0].attr == model[k]
            # versions tile time: sorted closes chain into opens
            seq = sorted(versions, key=lambda r: r.valid_from)
            for a, b in zip(seq, seq[1:]):
                assert a.valid_to == b.valid_from, (k, seq)


def test_scd2_asof_join_late_facts_point_in_time(spark):
    """SCD2 × as-of integration: late-arriving facts enriched with the
    dimension attribute AS OF each fact's own event time, two ways that
    must agree — (a) per-instant `as_of` slices, (b) one distributed
    `asof_join` of facts against the dim's version starts (valid_from is
    the version's effective instant; versions are contiguous, so latest
    valid_from <= ts IS the covering version). Expected frame is
    hand-computed."""
    import datetime as dt

    from polygon_daily_market_data_pipeline_spark.operators.asof import asof_join
    from polygon_daily_market_data_pipeline_spark.operators.scd import (
        as_of,
        scd2_init,
        scd2_merge,
    )

    t0 = dt.datetime(2024, 1, 1)
    t1 = dt.datetime(2024, 2, 1)
    t2 = dt.datetime(2024, 3, 1)

    def snap(rows, eff):
        return spark.createDataFrame(
            [(s, r, eff) for s, r in rows], "symbol string, rating string, eff timestamp"
        )

    dim = scd2_init(snap([("AAA", "A-"), ("BBB", "B+")], t0), ["symbol"], "eff")
    dim = scd2_merge(dim, snap([("AAA", "A+"), ("BBB", "B+")], t1), ["symbol"], ["rating"], "eff")
    dim = scd2_merge(dim, snap([("AAA", "AA"), ("CCC", "C")], t2), ["symbol"], ["rating"], "eff")

    facts = spark.createDataFrame(
        [
            ("AAA", dt.datetime(2024, 1, 15), 10.0),   # era 1 -> A-
            ("AAA", dt.datetime(2024, 2, 1), 20.0),    # boundary: t1 inclusive -> A+
            ("AAA", dt.datetime(2024, 2, 15), 30.0),   # era 2 -> A+
            ("AAA", dt.datetime(2024, 5, 1), 40.0),    # era 3 -> AA
            ("BBB", dt.datetime(2024, 4, 1), 50.0),    # unchanged key -> B+
            ("CCC", dt.datetime(2024, 1, 20), 60.0),   # before key existed -> NULL
            ("CCC", dt.datetime(2024, 3, 2), 70.0),    # new key, era 3 -> C
        ],
        "symbol string, ts timestamp, qty double",
    )
    expected = {
        ("AAA", dt.datetime(2024, 1, 15)): "A-",
        ("AAA", dt.datetime(2024, 2, 1)): "A+",
        ("AAA", dt.datetime(2024, 2, 15)): "A+",
        ("AAA", dt.datetime(2024, 5, 1)): "AA",
        ("BBB", dt.datetime(2024, 4, 1)): "B+",
        ("CCC", dt.datetime(2024, 1, 20)): None,
        ("CCC", dt.datetime(2024, 3, 2)): "C",
    }

    # (a) per-instant slice: filter the dim AS OF each distinct fact ts
    for (sym, ts), want in expected.items():
        sl = as_of(dim, ts).where(F.col("symbol") == sym).collect()
        got = sl[0]["rating"] if sl else None
        assert got == want, f"as_of({ts}) {sym}: {got} != {want}"

    # (b) one distributed asof_join over all facts at once
    versions = dim.select("symbol", F.col("valid_from").alias("ts"), "rating")
    enriched = asof_join(
        facts, versions, on="ts", by=["symbol"], value_cols=["rating"]
    )
    got = {
        (r.symbol, r.ts): r.rating_asof
        for r in enriched.collect()
    }
    assert got == expected


def test_scd2_stored_layout_matches_logical_merge(spark, tmp_path):
    """Storage-aware SCD2 (append-only history deltas + replace-only
    current slice): after any batch chain the stored read must equal
    the logical scd2_merge chain row-for-row, merges must never rewrite
    an existing history delta (files untouched), and re-applying the
    last batch (crash replay) must converge to the same state."""
    import datetime as dt
    import os

    from polygon_daily_market_data_pipeline_spark.operators.scd import (
        scd2_init,
        scd2_merge,
        scd2_store_init,
        scd2_store_merge,
        scd2_store_read,
    )

    def snap(rows, eff):
        return spark.createDataFrame(
            [(s, r, eff) for s, r in rows], "symbol string, rating string, eff timestamp"
        )

    batches = [
        snap([("AAA", "A-"), ("BBB", "B+")], dt.datetime(2024, 1, 1)),
        snap([("AAA", "A+"), ("BBB", "B+"), ("CCC", "C")], dt.datetime(2024, 2, 1)),
        snap([("AAA", "AA"), ("CCC", "C-")], dt.datetime(2024, 3, 1)),
    ]
    d = str(tmp_path / "dim")
    scd2_store_init(batches[0], d, ["symbol"], "eff")
    logical = scd2_init(batches[0], ["symbol"], "eff")

    def mtimes():
        out = {}
        hist = os.path.join(d, "history")
        for b in os.listdir(hist):
            p = os.path.join(hist, b)
            out[b] = max(
                os.path.getmtime(os.path.join(p, f)) for f in os.listdir(p)
            )
        return out

    key = lambda r: (r.symbol, r.rating, r.valid_from, r.valid_to, r.is_current)  # noqa: E731
    for b in batches[1:]:
        before = mtimes()
        scd2_store_merge(spark, d, b, ["symbol"], ["rating"], "eff")
        logical = scd2_merge(logical, b, ["symbol"], ["rating"], "eff")
        after = mtimes()
        # existing deltas were not rewritten
        for name, mt in before.items():
            assert after[name] == mt, name
        assert sorted(map(key, scd2_store_read(spark, d).collect())) == sorted(
            map(key, logical.collect())
        )

    # crash replay: re-applying the final batch converges (same state)
    state = sorted(map(key, scd2_store_read(spark, d).collect()))
    scd2_store_merge(spark, d, batches[-1], ["symbol"], ["rating"], "eff")
    assert sorted(map(key, scd2_store_read(spark, d).collect())) == state


def test_scd2_stored_crash_between_delta_and_swap(spark, tmp_path, monkeypatch):
    """Crash simulation: the history delta lands (with _SUCCESS) but the
    current-slice swap never happens. The rerun must keep the existing
    delta (not recompute it into emptiness) and redo the swap, ending in
    the same state as an uninterrupted merge."""
    import datetime as dt
    import os as _os

    from polygon_daily_market_data_pipeline_spark.operators.scd import (
        scd2_init,
        scd2_merge,
        scd2_store_init,
        scd2_store_merge,
        scd2_store_read,
    )

    def snap(rows, eff):
        return spark.createDataFrame(
            [(s, r, eff) for s, r in rows], "symbol string, rating string, eff timestamp"
        )

    b1 = snap([("AAA", "A-"), ("BBB", "B+")], dt.datetime(2024, 1, 1))
    b2 = snap([("AAA", "A+"), ("CCC", "C")], dt.datetime(2024, 2, 1))
    d = str(tmp_path / "dim")
    scd2_store_init(b1, d, ["symbol"], "eff")

    real_rename = _os.rename

    def exploding_rename(src, dst):
        if "_link_" in src:
            raise OSError("simulated crash before current swap")
        return real_rename(src, dst)

    monkeypatch.setattr(_os, "rename", exploding_rename)
    try:
        scd2_store_merge(spark, d, b2, ["symbol"], ["rating"], "eff")
        raise AssertionError("expected simulated crash")
    except OSError:
        pass
    monkeypatch.setattr(_os, "rename", real_rename)

    # delta landed, current slice still pre-batch
    hist = _os.path.join(d, "history")
    assert any(b.startswith("batch=") for b in _os.listdir(hist))

    scd2_store_merge(spark, d, b2, ["symbol"], ["rating"], "eff")  # replay
    logical = scd2_merge(
        scd2_init(b1, ["symbol"], "eff"), b2, ["symbol"], ["rating"], "eff"
    )
    key = lambda r: (r.symbol, r.rating, r.valid_from, r.valid_to, r.is_current)  # noqa: E731
    assert sorted(map(key, scd2_store_read(spark, d).collect())) == sorted(
        map(key, logical.collect())
    )


def test_scd2_stored_swap_retains_one_reader_generation(spark, tmp_path):
    """The current-slice flip must NOT delete the just-retired data dir
    (a concurrent reader resolves the symlink at file-listing time and
    reads the files later — deleting at flip time yanks them mid-scan).
    Exactly one retired generation is kept; older ones are reclaimed at
    the next swap."""
    import datetime as dt
    import os

    from polygon_daily_market_data_pipeline_spark.operators.scd import (
        scd2_store_init,
        scd2_store_merge,
        scd2_store_read,
    )

    def snap(rows, eff):
        return spark.createDataFrame(
            [(s, r, eff) for s, r in rows], "symbol string, rating string, eff timestamp"
        )

    d = str(tmp_path / "dim")
    scd2_store_init(snap([("AAA", "A")], dt.datetime(2024, 1, 1)), d, ["symbol"], "eff")

    def gens():
        return sorted(x for x in os.listdir(d) if x.startswith("current_"))

    g0 = gens()
    assert len(g0) == 1
    # a reader lists files from the pre-merge slice...
    stale_files = [
        os.path.join(d, g0[0], f)
        for f in os.listdir(os.path.join(d, g0[0]))
        if f.endswith(".parquet")
    ]
    scd2_store_merge(
        spark, d, snap([("AAA", "B")], dt.datetime(2024, 2, 1)), ["symbol"], ["rating"], "eff"
    )
    # ...and can still read them after the flip (one generation kept)
    assert all(os.path.exists(f) for f in stale_files)
    assert set(g0) < set(gens()) and len(gens()) == 2
    scd2_store_merge(
        spark, d, snap([("AAA", "C")], dt.datetime(2024, 3, 1)), ["symbol"], ["rating"], "eff"
    )
    # the two-merges-old generation is reclaimed
    assert g0[0] not in gens() and len(gens()) == 2
    assert scd2_store_read(spark, d).count() == 3  # 2 closed + 1 current
