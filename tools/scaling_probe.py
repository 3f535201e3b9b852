"""Scaling-slope probe for the dedup/similarity operators.

Times an operator at 1×/2×/4× the sf0.1 corpus (self-union with
re-keyed ids — same row distribution, no synthetic content) and prints
the empirical scaling exponent between successive doublings
(log2(t_2k / t_k)). Exponent ≈ 1 → linear, ≈ 2 → quadratic. Usage:

    python tools/scaling_probe.py [sf_dir] [op ...]

Evidence for SCALE.md's design claims; run on an otherwise idle
machine — the per-round VM shows up to 3× run-to-run noise under load,
so treat single runs as indicative, not exact.
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))


def scaled_docs(spark, sf_dir: str, k: int):
    from pyspark.sql import functions as F

    from polygon_daily_market_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    out = docs
    for i in range(1, k):
        out = out.unionByName(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * n))
        )
    # materialized once so the op under test never re-reads the union
    return out.repartition(32).persist(), n * k


OPS = {}


def op(name):
    def wrap(fn):
        OPS[name] = fn
        return fn

    return wrap


@op("minhash_lsh")
def _lsh(docs):
    from polygon_daily_market_data_pipeline_spark.operators.text_dedup import (
        minhash_lsh_pairs,
    )

    return minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5)


@op("jaccard_capped")
def _jac(docs):
    from polygon_daily_market_data_pipeline_spark.operators.text_dedup import (
        jaccard_pairs,
    )

    return jaccard_pairs(docs, "doc_id", "text", threshold=0.5, df_cap=100)


@op("exact_dedup")
def _exact(docs):
    from polygon_daily_market_data_pipeline_spark.operators.text_dedup import (
        exact_dedup,
    )

    return exact_dedup(docs, "doc_id", "text")


def probe_refresh(spark, sf_dir: str) -> None:
    """Incremental-MV claim: refresh cost is O(new data), flat in
    history size, while a full recompute grows with history. Builds a
    day-partitioned events fact at 1×/2×/4× history (day-offset
    self-union — same per-day volume), fully refreshes it untimed, then
    times (a) one refresh after one fixed-size new day arrives and
    (b) the full-recompute groupBy over the whole fact."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from polygon_daily_market_data_pipeline_spark.operators.incremental import (
        refresh_aggregate,
    )
    from polygon_daily_market_data_pipeline_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", F.to_date("ts").alias("day")
    )
    span = ev.agg(
        (F.datediff(F.max("day"), F.min("day")) + 1).alias("d")
    ).first()["d"]
    measures = {"n": ("count", "event_id"), "s": ("sum", "value")}
    new_day = ev.where(F.col("day") == ev.agg(F.min("day")).first()[0]).withColumn(
        "day", F.date_add("day", 10_000)
    )
    results = []
    for k in (1, 4, 16):
        hist = ev
        for i in range(1, k):
            hist = hist.unionByName(
                ev.withColumn("day", F.date_add("day", i * span))
            )
        base = tempfile.mkdtemp(prefix=f"refresh_probe_{k}x_")
        fact, state = f"{base}/fact", f"{base}/state"
        hist.repartition("day").write.partitionBy("day").parquet(fact)
        refresh_aggregate(spark, fact, state, ["event_type"], measures, "day")
        new_day.coalesce(1).write.mode("append").partitionBy("day").parquet(fact)
        t0 = time.monotonic()
        refresh_aggregate(
            spark, fact, state, ["event_type"], measures, "day"
        ).write.format("noop").mode("overwrite").save()
        t_incr = time.monotonic() - t0
        t0 = time.monotonic()
        (
            spark.read.parquet(fact)
            .groupBy("event_type")
            .agg(F.count("event_id"), F.sum("value"))
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        t_full = time.monotonic() - t0
        n_days = len(
            [d for d in __import__("os").listdir(fact) if d.startswith("day=")]
        )
        results.append((k, n_days, t_incr, t_full))
        shutil.rmtree(base, ignore_errors=True)
    pts = ", ".join(
        f"{k}x({d}d) incr={ti:.2f}s full={tf:.2f}s" for k, d, ti, tf in results
    )
    print(f"refresh_mv: {pts}")


def probe_skipping(spark, sf_dir: str) -> None:
    """Data-skipping claim at bench scale: a selective conjunctive
    range scan through ``scan_version`` (manifest file-stats prune,
    then residual filter) schedules a small fraction of a z-ordered
    table's files and beats the same filter over ``read_version``
    (which schedules every file and relies on per-task footer
    skipping). Prints files-scheduled and wall-clock for both."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from polygon_daily_market_data_pipeline_spark.operators.versioned import (
        commit_version,
        optimize_zorder,
        read_version,
        scan_version,
    )
    from polygon_daily_market_data_pipeline_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", "ts"
    )
    lo_u, hi_u, lo_t, hi_t = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("ts"), F.max("ts")
    ).first()
    u_span, t_span = hi_u - lo_u, hi_t - lo_t
    preds = {
        "user_id": (lo_u, lo_u + int(u_span * 0.05)),
        "ts": (lo_t, lo_t + t_span * 0.05),
    }
    base = tempfile.mkdtemp(prefix="skip_probe_")
    try:
        commit_version(ev, base)
        v = optimize_zorder(spark, base, ["user_id", "ts"], n_files=64)
        for label, df in (
            ("scan_version", scan_version(spark, base, preds, version=v)),
            (
                "read+filter",
                read_version(spark, base, version=v).where(
                    F.col("user_id").between(*preds["user_id"])
                    & F.col("ts").between(*preds["ts"])
                ),
            ),
        ):
            t0 = time.monotonic()
            n = df.count()
            t = time.monotonic() - t0
            print(
                f"skipping[{label}]: files={len(df.inputFiles())}/64 "
                f"rows={n} t={t:.2f}s"
            )
    finally:
        shutil.rmtree(base, ignore_errors=True)


def probe_scd2_stored(spark, sf_dir: str) -> None:
    """Stored-SCD2 claim: one merge costs O(|current| + |batch|) —
    FLAT in history size — because the merge joins only the current
    slice and appends only the batch's closed rows; history bytes are
    written exactly once, ever. Builds the stored dimension with
    1×/4×/16× history generations (every-key-changes merges, so history
    grows by |keys| per generation), then times ONE fixed final merge
    and reports its wall-clock and the bytes it wrote (closed delta +
    new current). Flat numbers across 16× history growth are the
    evidence; a full-rewrite SCD would grow both linearly."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from polygon_daily_market_data_pipeline_spark.operators.scd import (
        scd2_store_init,
        scd2_store_merge,
    )
    from polygon_daily_market_data_pipeline_spark.sources.tables import load_table

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.lit("2020-01-01 00:00:00").cast("timestamp").alias("eff"),
    ).persist()
    n_keys = cust.count()

    def batch(i: int):
        return cust.select(
            "c_custkey",
            F.lit(f"S{i}").alias("segment"),
            (F.col("eff") + F.make_interval(days=F.lit(i + 1))).alias("eff"),
        )

    def tree_bytes(path: str) -> int:
        total = 0
        for root, _dirs, files in os.walk(path):
            total += sum(
                os.path.getsize(os.path.join(root, f))
                for f in files
                if not f.startswith((".", "_"))
            )
        return total

    results = []
    for k in (1, 4, 16):
        base = tempfile.mkdtemp(prefix=f"scd2_probe_{k}x_")
        dim = f"{base}/dim"
        scd2_store_init(cust, dim, ["c_custkey"], "eff")
        for i in range(k):  # untimed history growth: k full-churn merges
            scd2_store_merge(
                spark, dim, batch(i), ["c_custkey"], ["segment"], "eff"
            )
        deltas_before = set(os.listdir(os.path.join(dim, "history")))
        t0 = time.monotonic()
        scd2_store_merge(
            spark, dim, batch(99), ["c_custkey"], ["segment"], "eff"
        )
        t = time.monotonic() - t0
        # bytes the timed merge wrote: its closed-delta dir + the new
        # current slice (the swap retires, it never rewrites history)
        new_delta = set(os.listdir(os.path.join(dim, "history"))) - deltas_before
        written = tree_bytes(
            os.path.realpath(os.path.join(dim, "current"))
        ) + sum(
            tree_bytes(os.path.join(dim, "history", d)) for d in new_delta
        )
        results.append((k, k * n_keys, t, written))
        shutil.rmtree(base, ignore_errors=True)
    cust.unpersist()
    pts = ", ".join(
        f"{k}x(hist={h}r) merge={t:.2f}s wrote={b / 1e6:.1f}MB"
        for k, h, t, b in results
    )
    print(f"scd2_stored: {pts}")


def probe_change_feed(spark, sf_dir: str) -> None:
    """Change-feed claim: consuming the latest appends costs O(new
    data), flat in table history, while a snapshot read grows with it.
    Builds a versioned events table at 1×/4×/16× history (one append
    commit per history generation), then times (a) ``read_changes``
    over just the LAST append and (b) the full latest-version read."""
    import shutil
    import tempfile

    from polygon_daily_market_data_pipeline_spark.operators.versioned import (
        commit_version,
        read_changes,
        read_version,
    )
    from polygon_daily_market_data_pipeline_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    results = []
    for k in (1, 4, 16):
        t = tempfile.mkdtemp(prefix=f"feed_probe_{k}x_")
        commit_version(ev.repartition(8), t)  # v0 snapshot
        for i in range(1, k):  # history generations (untimed)
            commit_version(
                ev.withColumn("event_id", ev.event_id + i * 10_000_000)
                .repartition(8),
                t,
                mode="append",
            )
        # the fixed-size new commit whose consumption we time
        tail = ev.limit(20_000).repartition(2)
        from_v = k - 1
        commit_version(tail, t, mode="append")
        # sum(value) forces a data read — count() would be answered
        # from parquet footers alone and understate the full-scan cost
        from pyspark.sql import functions as F

        t0 = time.monotonic()
        feed = read_changes(spark, t, from_v)
        n_feed = feed.count()
        feed.agg(F.sum("value")).collect()
        t_feed = time.monotonic() - t0
        t0 = time.monotonic()
        full = read_version(spark, t)
        n_full = full.count()
        full.agg(F.sum("value")).collect()
        t_full = time.monotonic() - t0
        results.append((k, n_full, n_feed, t_feed, t_full))
        shutil.rmtree(t, ignore_errors=True)
    pts = ", ".join(
        f"{k}x(table={nf}r) feed={ff:.2f}s({nd}r) full={fl:.2f}s"
        for k, nf, nd, ff, fl in results
    )
    print(f"change_feed: {pts}")


def probe_merge(spark, sf_dir: str) -> None:
    """merge_version claim: a fixed-size MERGE costs O(touched data +
    source), FLAT in table size — stats-scoped discovery rewrites only
    the commits whose key envelope can contain a source key and carries
    the rest by reference. Builds a versioned orders table from
    1×/4×/16× key-disjoint range-partitioned commits (key-shifted
    copies, constant per-commit volume), then times ONE fixed merge
    whose update keys all fall in the FIRST commit's range and whose
    insert keys lie beyond every range. Reports wall-clock, bytes
    written, and rewritten/total file counts: flat time and bytes with
    total files growing 16× is the evidence; an anti-join over the
    whole table would grow linearly."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from polygon_daily_market_data_pipeline_spark.operators.versioned import (
        commit_version,
        merge_version,
        read_version,
    )
    from polygon_daily_market_data_pipeline_spark.sources.tables import load_table

    def tree_bytes(path: str) -> int:
        total = 0
        for root, _dirs, files in os.walk(path):
            total += sum(
                os.path.getsize(os.path.join(root, f))
                for f in files
                if not f.startswith((".", "_"))
            )
        return total

    ord_df = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    ).persist()
    n = ord_df.count()
    off = 10 ** len(str(n * 20))  # beyond any shifted key at this sf
    # the fixed-size source: updates inside commit 0's key range,
    # inserts beyond every commit's range (monotone new keys)
    updates = ord_df.where(F.col("o_orderkey") % 50 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") + F.lit(1.0)
    )
    inserts = ord_df.where(F.col("o_orderkey") % 97 == 0).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(100 * off).cast("long")
    )
    source = updates.unionByName(inserts)
    results = []
    for k in (1, 4, 16):
        per_strategy = {}
        for strategy in ("copy_on_write", "merge_on_read"):
            t = tempfile.mkdtemp(prefix=f"merge_probe_{strategy}_{k}x_")
            for i in range(k):  # untimed: k key-disjoint stats'd commits
                commit_version(
                    ord_df.withColumn(
                        "o_orderkey",
                        (F.col("o_orderkey") + F.lit(i * off)).cast("long"),
                    ).repartitionByRange(8, "o_orderkey"),
                    t,
                    mode="append" if i else "overwrite",
                    stats_cols=["o_orderkey"],
                )
            files_before = set(read_version(spark, t).inputFiles())
            data_before = set(os.listdir(os.path.join(t, "_data")))
            t0 = time.monotonic()
            v = merge_version(
                spark, t, source, keys=["o_orderkey"],
                stats_cols=["o_orderkey"], strategy=strategy,
            )
            dt = time.monotonic() - t0
            after_files = {
                f
                for f in read_version(spark, t, version=v).inputFiles()
                if "_dv" not in f
            }
            rewritten = len(files_before - after_files)
            new_dirs = set(os.listdir(os.path.join(t, "_data"))) - data_before
            wrote = sum(
                tree_bytes(os.path.join(t, "_data", d)) for d in new_dirs
            )
            dv_root = os.path.join(t, "_dv")
            if os.path.isdir(dv_root):
                wrote += tree_bytes(dv_root)
            cnt = read_version(spark, t, version=v).count()
            per_strategy[strategy] = (dt, wrote, rewritten, cnt)
            shutil.rmtree(t, ignore_errors=True)
        assert (
            per_strategy["copy_on_write"][3]
            == per_strategy["merge_on_read"][3]
        ), per_strategy
        results.append((k, k * n, per_strategy, len(files_before)))
    ord_df.unpersist()
    pts = ", ".join(
        f"{k}x(table={r}r) "
        f"cow={ps['copy_on_write'][0]:.2f}s/"
        f"{ps['copy_on_write'][1] / 1e6:.1f}MB/"
        f"rw{ps['copy_on_write'][2]} "
        f"mor={ps['merge_on_read'][0]:.2f}s/"
        f"{ps['merge_on_read'][1] / 1e6:.1f}MB/"
        f"rw{ps['merge_on_read'][2]}"
        for k, r, ps, _tot in results
    )
    print(f"versioned_merge: {pts}")


def probe_dv(spark, sf_dir: str) -> None:
    """Deletion-vector claim: a scattered small DELETE writes O(deleted
    rows) bytes, while copy-on-write rewrites O(touched directories) —
    at a GDPR-erasure shape (a few rows in EVERY commit dir) that is
    the whole table. Builds twin versioned orders tables from 1×/4×/16×
    key-shifted range-partitioned commits, deletes ~64 rows PER COMMIT
    spread across all of them (no prune — every dir is genuinely
    touched), and reports wall-clock + bytes written for
    delete_version_vectors vs delete_version_where. Flat-vs-16× bytes
    is the evidence; the DV read-back count pins correctness."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from polygon_daily_market_data_pipeline_spark.operators.versioned import (
        commit_version,
        delete_version_keys,
        delete_version_vectors,
        delete_version_where,
        read_version,
    )
    from polygon_daily_market_data_pipeline_spark.sources.tables import load_table

    def tree_bytes(path: str) -> int:
        total = 0
        for root, _dirs, files in os.walk(path):
            total += sum(
                os.path.getsize(os.path.join(root, f))
                for f in files
                if not f.startswith(".")
            )
        return total

    ord_df = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    ).persist()
    n = ord_df.count()
    off = 10 ** len(str(n * 20))
    step = max(1, n // 64)  # ~64 matches per commit, every commit hit
    results = []
    for k in (1, 4, 16):
        tables = {}
        for kind in ("dv", "cow", "eq"):
            t = tempfile.mkdtemp(prefix=f"dv_probe_{kind}_{k}x_")
            for i in range(k):
                commit_version(
                    ord_df.withColumn(
                        "o_orderkey",
                        (F.col("o_orderkey") + F.lit(i * off)).cast("long"),
                    ).repartitionByRange(8, "o_orderkey"),
                    t,
                    mode="append" if i else "overwrite",
                    stats_cols=["o_orderkey"],
                )
            tables[kind] = t
        pred = (F.col("o_orderkey") % F.lit(off)) % F.lit(step) == 17
        t0 = time.monotonic()
        v = delete_version_vectors(spark, tables["dv"], pred)
        dt_dv = time.monotonic() - t0
        dv_bytes = tree_bytes(os.path.join(tables["dv"], "_dv"))
        t0 = time.monotonic()
        delete_version_where(spark, tables["cow"], pred)
        dt_cow = time.monotonic() - t0
        # CoW writes = every _data dir the new version references that
        # did not exist before the delete == all m-* rewrite dirs
        cow_bytes = sum(
            tree_bytes(os.path.join(tables["cow"], "_data", d))
            for d in os.listdir(os.path.join(tables["cow"], "_data"))
            if d.startswith("m-")
        )
        # equality delete: the SAME rows by KEY LIST — zero table IO
        # at commit, the sidecar is the erasure list itself
        eq_keys = spark.range(k).selectExpr("id AS i").join(
            ord_df.where(
                (F.col("o_orderkey") % F.lit(step) == 17)
            ).selectExpr("o_orderkey AS base_key"),
        ).selectExpr(f"base_key + i * CAST({off} AS BIGINT) AS o_orderkey")
        t0 = time.monotonic()
        delete_version_keys(spark, tables["eq"], eq_keys, ["o_orderkey"])
        dt_eq = time.monotonic() - t0
        eq_bytes = tree_bytes(os.path.join(tables["eq"], "_eqdel"))
        n_dv = read_version(spark, tables["dv"], version=v).count()
        n_cow = read_version(spark, tables["cow"]).count()
        n_eq = read_version(spark, tables["eq"]).count()
        assert n_dv == n_cow == n_eq, (n_dv, n_cow, n_eq)
        results.append(
            (k, dt_dv, dv_bytes, dt_cow, cow_bytes, n * k - n_dv, dt_eq, eq_bytes)
        )
        for t in tables.values():
            shutil.rmtree(t, ignore_errors=True)
    ord_df.unpersist()
    pts = ", ".join(
        f"{k}x del={d}r dv={dt_dv:.2f}s/{db / 1e3:.0f}KB "
        f"cow={dt_cow:.2f}s/{cb / 1e6:.1f}MB "
        f"eq={dt_eq:.2f}s/{eb / 1e3:.0f}KB"
        for k, dt_dv, db, dt_cow, cb, d, dt_eq, eb in results
    )
    print(f"versioned_dv: {pts}")


def probe_update(spark, sf_dir: str) -> None:
    """Merge-on-read UPDATE claim: a scattered small UPDATE writes
    O(matched rows) bytes — one (file, pos) tombstone sidecar plus one
    appended image directory — while copy-on-write rewrites O(touched
    directories). Same GDPR-erasure shape as probe_dv (~64 matches in
    EVERY commit dir of a 1×/4×/16× table), twin tables, read-back
    sum-equality pins the semantics."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from polygon_daily_market_data_pipeline_spark.operators.versioned import (
        commit_version,
        read_version,
        update_version_vectors,
        update_version_where,
    )
    from polygon_daily_market_data_pipeline_spark.sources.tables import load_table

    def tree_bytes(path: str) -> int:
        total = 0
        for root, _dirs, files in os.walk(path):
            total += sum(
                os.path.getsize(os.path.join(root, f))
                for f in files
                if not f.startswith(".")
            )
        return total

    ord_df = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    ).persist()
    n = ord_df.count()
    off = 10 ** len(str(n * 20))
    step = max(1, n // 64)  # ~64 matches per commit, every commit hit
    results = []
    for k in (1, 4, 16):
        tables = {}
        for kind in ("dv", "cow"):
            t = tempfile.mkdtemp(prefix=f"upd_probe_{kind}_{k}x_")
            for i in range(k):
                commit_version(
                    ord_df.withColumn(
                        "o_orderkey",
                        (F.col("o_orderkey") + F.lit(i * off)).cast("long"),
                    ).repartitionByRange(8, "o_orderkey"),
                    t,
                    mode="append" if i else "overwrite",
                    stats_cols=["o_orderkey"],
                )
            tables[kind] = t
        pred = (F.col("o_orderkey") % F.lit(off)) % F.lit(step) == 17
        assign = {"o_totalprice": "o_totalprice + 100000.0"}
        t0 = time.monotonic()
        v = update_version_vectors(spark, tables["dv"], pred, assign)
        dt_dv = time.monotonic() - t0
        dv_bytes = tree_bytes(os.path.join(tables["dv"], "_dv")) + sum(
            tree_bytes(os.path.join(tables["dv"], "_data", d))
            for d in os.listdir(os.path.join(tables["dv"], "_data"))
            if d.startswith("u-")
        )
        t0 = time.monotonic()
        update_version_where(spark, tables["cow"], pred, assign)
        dt_cow = time.monotonic() - t0
        cow_bytes = sum(
            tree_bytes(os.path.join(tables["cow"], "_data", d))
            for d in os.listdir(os.path.join(tables["cow"], "_data"))
            if d.startswith("m-")
        )
        agg_dv = read_version(spark, tables["dv"], version=v).agg(
            F.count(F.lit(1)), F.round(F.sum("o_totalprice"), 2)
        ).first()
        agg_cow = read_version(spark, tables["cow"]).agg(
            F.count(F.lit(1)), F.round(F.sum("o_totalprice"), 2)
        ).first()
        assert tuple(agg_dv) == tuple(agg_cow), (agg_dv, agg_cow)
        matched = (
            read_version(spark, tables["dv"], version=v).where(pred).count()
        )
        results.append((k, dt_dv, dv_bytes, dt_cow, cow_bytes, matched))
        for t in tables.values():
            shutil.rmtree(t, ignore_errors=True)
    ord_df.unpersist()
    pts = ", ".join(
        f"{k}x upd~{m}r dv={dt_dv:.2f}s/{db / 1e3:.0f}KB "
        f"cow={dt_cow:.2f}s/{cb / 1e6:.1f}MB"
        for k, dt_dv, db, dt_cow, cb, m in results
    )
    print(f"versioned_update_dv: {pts}")


def probe_compact(spark, sf_dir: str) -> None:
    """Small-file compaction claim: with a FIXED stream of 64 tiny
    appends, `optimize_compact`'s cost and bytes written are O(small
    data) — FLAT as the big table underneath grows 1×/4×/16× — because
    at-size directories are carried by reference, never rewritten. The
    read side drops from (big + 64) scheduled files to (big + bins).
    A compact that rewrote the table would grow 16× in the last
    column; this one must not."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from polygon_daily_market_data_pipeline_spark.operators.versioned import (
        commit_version,
        optimize_compact,
        read_version,
    )
    from polygon_daily_market_data_pipeline_spark.sources.tables import load_table

    def tree_bytes(path: str) -> int:
        total = 0
        for root, _dirs, files in os.walk(path):
            total += sum(
                os.path.getsize(os.path.join(root, f))
                for f in files
                if not f.startswith(".")
            )
        return total

    ord_df = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    ).persist()
    n = ord_df.count()
    off = 10 ** len(str(n * 20))
    tiny = ord_df.limit(200).persist()
    tiny.count()
    results = []
    for k in (1, 4, 16):
        t = tempfile.mkdtemp(prefix=f"compact_probe_{k}x_")
        for i in range(k):
            commit_version(
                ord_df.withColumn(
                    "o_orderkey",
                    (F.col("o_orderkey") + F.lit(i * off)).cast("long"),
                ).repartitionByRange(8, "o_orderkey"),
                t,
                mode="append" if i else "overwrite",
                stats_cols=["o_orderkey"],
            )
        for j in range(64):
            commit_version(
                tiny.withColumn(
                    "o_orderkey",
                    (F.col("o_orderkey") + F.lit((k + j) * off)).cast("long"),
                ).coalesce(1),
                t,
                mode="append",
            )
        before = read_version(spark, t)
        n_before, files_before = before.count(), len(before.inputFiles())
        t0 = time.monotonic()
        v = optimize_compact(spark, t, target_bytes=256 * 1024)
        dt = time.monotonic() - t0
        wrote = sum(
            tree_bytes(os.path.join(t, "_data", d))
            for d in os.listdir(os.path.join(t, "_data"))
            if d.startswith("k-")
        )
        after = read_version(spark, t, version=v)
        n_after, files_after = after.count(), len(after.inputFiles())
        assert n_after == n_before == n * k + 64 * 200, (n_after, n_before)
        results.append((k, files_before, files_after, dt, wrote))
        shutil.rmtree(t, ignore_errors=True)
    ord_df.unpersist()
    tiny.unpersist()
    pts = ", ".join(
        f"{k}x files {fb}->{fa} compact={dt:.2f}s/{w / 1e3:.0f}KB"
        for k, fb, fa, dt, w in results
    )
    print(f"optimize_compact: {pts}")


def probe_bloom(spark, sf_dir: str) -> None:
    """Sidecar-bloom claim: a point lookup on a hash-scattered
    high-cardinality column schedules O(1) files no matter how many the
    table has — where [min,max] envelopes (every file spans the whole
    domain) prune nothing. Builds an orders-derived table at 64/256/1024
    files, looks up one key, and reports files scheduled + wall-clock vs
    the same lookup WITHOUT blooms (full schedule)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from polygon_daily_market_data_pipeline_spark.operators.versioned import (
        commit_version,
        scan_version_with_stats,
    )
    from polygon_daily_market_data_pipeline_spark.sources.tables import load_table

    ord_df = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    key = ord_df.agg(F.max("o_orderkey")).first()[0]
    results = []
    for n_files in (64, 256, 1024):
        t = tempfile.mkdtemp(prefix=f"bloom_probe_{n_files}f_")
        commit_version(
            ord_df.repartition(n_files), t, bloom_cols=["o_orderkey"]
        )
        plain = tempfile.mkdtemp(prefix=f"bloom_probe_plain_{n_files}f_")
        commit_version(ord_df.repartition(n_files), plain)
        t0 = time.monotonic()
        scan, stats = scan_version_with_stats(
            spark, t, {}, eq={"o_orderkey": key}
        )
        n = scan.count()
        dt_bloom = time.monotonic() - t0
        t0 = time.monotonic()
        scan_p, stats_p = scan_version_with_stats(
            spark, plain, {}, eq={"o_orderkey": key}
        )
        n_p = scan_p.count()
        dt_plain = time.monotonic() - t0
        assert n == n_p == 1, (n, n_p)
        results.append(
            (n_files, stats.files_scheduled, dt_bloom,
             stats_p.files_scheduled, dt_plain)
        )
        shutil.rmtree(t, ignore_errors=True)
        shutil.rmtree(plain, ignore_errors=True)
    pts = ", ".join(
        f"{nf}f bloom={bs}f/{bt:.2f}s plain={ps}f/{pt:.2f}s"
        for nf, bs, bt, ps, pt in results
    )
    print(f"bloom_lookup: {pts}")


def probe_cdc(spark, sf_dir: str) -> None:
    """CDC-replication claim (``replicate_changes``): once the replica
    is bootstrapped, each incremental apply costs O(changed keys) —
    bytes written to the replica and apply wall-clock stay FLAT as the
    replicated table grows 16× underneath. Builds a versioned source of
    1×/4×/16× key-shifted orders commits, bootstraps a merge-on-read
    replica, then appends ONE fixed ~256-key change batch (new images
    of existing keys, scattered across the key space) and times the
    second ``replicate_changes`` drain. Read-back pins the semantics:
    the replica holds exactly the latest image per key."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from polygon_daily_market_data_pipeline_spark.operators.versioned import (
        commit_version,
        read_version,
        replicate_changes,
    )
    from polygon_daily_market_data_pipeline_spark.sources.tables import load_table

    def tree_bytes(path: str) -> int:
        total = 0
        for root, _dirs, files in os.walk(path):
            total += sum(
                os.path.getsize(os.path.join(root, f))
                for f in files
                if not f.startswith(".")
            )
        return total

    ord_df = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .withColumn("ver", F.lit(0).cast("long"))
        .persist()
    )
    n = ord_df.count()
    off = 10 ** len(str(n * 20))
    results = []
    for k in (1, 4, 16):
        src = tempfile.mkdtemp(prefix=f"cdc_probe_src_{k}x_")
        dst = tempfile.mkdtemp(prefix=f"cdc_probe_dst_{k}x_")
        ckpt = tempfile.mkdtemp(prefix=f"cdc_probe_ckpt_{k}x_")
        for i in range(k):
            commit_version(
                ord_df.withColumn(
                    "o_orderkey",
                    (F.col("o_orderkey") + F.lit(i * off)).cast("long"),
                ).repartitionByRange(8, "o_orderkey"),
                src,
                mode="append" if i else "overwrite",
                stats_cols=["o_orderkey"],
            )
        # bootstrap: snapshot drain, O(table) by design — not the claim
        t0 = time.monotonic()
        replicate_changes(
            spark, src, dst, ["o_orderkey"], "ver", ckpt,
            stats_cols=["o_orderkey"],
        )
        dt_boot = time.monotonic() - t0
        # ONE fixed change batch: ~256 existing keys get a new image,
        # scattered across ALL k commit ranges (worst case for pruning)
        per = max(1, 256 // k)
        step = max(1, n // per)
        changes = (
            spark.range(k)
            .selectExpr("id AS i")
            .join(
                ord_df.where(F.col("o_orderkey") % F.lit(step) == 17)
                .selectExpr("o_orderkey AS base_key"),
            )
            .selectExpr(
                f"base_key + i * CAST({off} AS BIGINT) AS o_orderkey",
                "CAST(-1.0 AS DOUBLE) AS o_totalprice",
                "CAST(1 AS BIGINT) AS ver",
            )
        )
        n_changed = changes.count()
        commit_version(changes, src, mode="append", stats_cols=["o_orderkey"])
        before = tree_bytes(dst)
        t0 = time.monotonic()
        replicate_changes(
            spark, src, dst, ["o_orderkey"], "ver", ckpt,
            stats_cols=["o_orderkey"],
        )
        dt_apply = time.monotonic() - t0
        apply_bytes = tree_bytes(dst) - before
        rep = read_version(spark, dst)
        n_rep = rep.count()
        n_upd = rep.where(F.col("o_totalprice") == -1.0).count()
        assert n_rep == n * k, (n_rep, n * k)
        assert n_upd == n_changed, (n_upd, n_changed)
        results.append((k, dt_boot, n_changed, dt_apply, apply_bytes))
        for d in (src, dst, ckpt):
            shutil.rmtree(d, ignore_errors=True)
    ord_df.unpersist()
    pts = ", ".join(
        f"{k}x boot={db:.2f}s apply({c}k)={da:.2f}s/{ab / 1e3:.0f}KB"
        for k, db, c, da, ab in results
    )
    print(f"cdc_replication: {pts}")


def probe_expectations(spark, sf_dir: str) -> None:
    """Streaming-expectations-sink claims (``quality.py`` /
    ``versioned_stream_sink``), both measured:

    1. ONE aggregate pass regardless of expectation count — Spark JOBS
       and wall-clock stay flat at 1/8/32 expectations over the same
       batch (a per-expectation implementation would launch one job
       per gate).
    2. Quarantine overhead is O(batch) — the full sink (expectations +
       clean commit + dead-letter commit) over 1×/4×/16× batches grows
       linearly in rows, never in gates or table history.
    """
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from polygon_daily_market_data_pipeline_spark.operators.quality import (
        apply_expectations,
    )
    from polygon_daily_market_data_pipeline_spark.operators.versioned import (
        versioned_stream_sink,
    )
    from polygon_daily_market_data_pipeline_spark.sources.tables import load_table

    ord_df = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .persist()
    )
    n = ord_df.count()
    tracker = spark.sparkContext.statusTracker()

    def gates(m: int) -> dict:
        # every gate a REAL predicate with failures (≈1% each), so the
        # quarantine split is exercised, not constant-folded away
        return {
            f"g{i}": f"(o_orderkey + {i}) % 97 != 0" for i in range(m)
        }

    # axis 1: expectation count — jobs + time flat
    flat = []
    for m in (1, 8, 32):
        group = f"exp_probe_{m}"
        spark.sparkContext.setJobGroup(group, "expectations probe")
        t0 = time.monotonic()
        res = apply_expectations(ord_df, gates(m), on_fail="quarantine")
        n_clean = res.clean.count()
        n_bad = res.quarantined.count()
        dt = time.monotonic() - t0
        spark.sparkContext.setJobGroup(None, None)
        jobs = len(tracker.getJobIdsForGroup(group))
        assert n_clean + n_bad == n, (n_clean, n_bad, n)
        flat.append((m, jobs, dt))
    # axis 2: batch size — full sink O(batch). Untimed warm-up commit
    # first so the 1x point is not JVM/commit-path startup cost.
    wt = tempfile.mkdtemp(prefix="exp_probe_warm_t_")
    wq = tempfile.mkdtemp(prefix="exp_probe_warm_q_")
    versioned_stream_sink(
        wt, stats_cols=["o_orderkey"], expectations=gates(8),
        quarantine_dir=wq,
    )(ord_df.limit(1000), 0)
    shutil.rmtree(wt, ignore_errors=True)
    shutil.rmtree(wq, ignore_errors=True)
    lin = []
    for k in (1, 4, 16):
        batch = ord_df
        for i in range(1, k):
            batch = batch.unionByName(
                ord_df.withColumn(
                    "o_orderkey", F.col("o_orderkey") + F.lit(i * 10 * n)
                )
            )
        batch = batch.repartition(16).persist()
        batch.count()
        t = tempfile.mkdtemp(prefix=f"exp_probe_t_{k}x_")
        q = tempfile.mkdtemp(prefix=f"exp_probe_q_{k}x_")
        sink = versioned_stream_sink(
            t,
            stats_cols=["o_orderkey"],
            expectations=gates(8),
            quarantine_dir=q,
        )
        t0 = time.monotonic()
        sink(batch, 0)
        dt = time.monotonic() - t0
        lin.append((k, n * k, dt))
        batch.unpersist()
        shutil.rmtree(t, ignore_errors=True)
        shutil.rmtree(q, ignore_errors=True)
    ord_df.unpersist()
    pts_flat = ", ".join(f"{m}exp={j}jobs/{dt:.2f}s" for m, j, dt in flat)
    pts_lin = ", ".join(f"{k}x({r}r)={dt:.2f}s" for k, r, dt in lin)
    print(f"expectations_gates: {pts_flat}")
    print(f"expectations_sink: {pts_lin}")


def probe_vacuum(spark, sf_dir: str) -> None:
    """Vacuum orphan-sweep claim: at manifest scale (a 1K-version,
    5K-directory table with dv/eqdel sidecars and crash debris) the
    sweep's driver cost is MANIFEST-sized — it reads kept manifests and
    directory listings, never a data file, and launches zero Spark jobs
    — and its deletions are EXACT: everything unreferenced goes,
    everything referenced stays. The table is built synthetically
    (manifests via ``_publish_manifest``, data dirs as 1-file stubs) —
    honest for what is measured, since vacuum itself never opens a data
    file; correctness of vacuum against REAL op histories is the
    property test (`tests/test_versioned_vacuum_props.py`)."""
    import os
    import shutil
    import tempfile

    from polygon_daily_market_data_pipeline_spark.operators.versioned import (
        _commit_ts,
        _load_manifest,
        _manifests,
        _publish_manifest,
        vacuum,
    )

    results = []
    for n_versions in (100, 400, 1000):
        t = tempfile.mkdtemp(prefix=f"vac_probe_{n_versions}v_")
        data_root = os.path.join(t, "_data")
        dv_root = os.path.join(t, "_dv")
        eq_root = os.path.join(t, "_eqdel")
        for r in (data_root, dv_root, eq_root, os.path.join(t, "_versions")):
            os.makedirs(r)
        # streamed+compacted shape: each version's visibility is its own
        # 5 fresh dirs (the compaction-heavy worst case for orphans);
        # every 10th version carries a dv sidecar, every 25th an eqdel
        prev = None
        for v in range(n_versions):
            dirs = []
            for j in range(5):
                d = f"b-{v:05d}-{j}"
                os.mkdir(os.path.join(data_root, d))
                with open(
                    os.path.join(data_root, d, "part-0.parquet"), "wb"
                ) as f:
                    f.write(b"x" * 512)
                dirs.append(os.path.join("_data", d))
            manifest = {
                "version": v,
                "committed_at": _commit_ts(prev),
                "mode": "overwrite",
                "dirs": dirs,
            }
            if v % 10 == 0:
                d = f"dv-{v:05d}"
                os.mkdir(os.path.join(dv_root, d))
                with open(os.path.join(dv_root, d, "pos.parquet"), "wb") as f:
                    f.write(b"y" * 256)
                manifest["dv"] = {
                    dirs[0]: {"refs": [os.path.join("_dv", d)], "n": 1}
                }
            if v % 25 == 0:
                d = f"eq-{v:05d}"
                os.mkdir(os.path.join(eq_root, d))
                with open(os.path.join(eq_root, d, "keys.parquet"), "wb") as f:
                    f.write(b"z" * 256)
                manifest["eqdel"] = [
                    {"ref": os.path.join("_eqdel", d), "cols": ["k"],
                     "dirs": dirs}
                ]
            _publish_manifest(t, v, manifest)
            prev = manifest
        # crash debris: committed by nobody, sweepable by contract
        os.mkdir(os.path.join(data_root, "debris-crashed"))
        with open(
            os.path.join(data_root, "debris-crashed", "part-0.parquet"), "wb"
        ) as f:
            f.write(b"d" * 512)
        n_dirs = len(os.listdir(data_root))
        t0 = time.monotonic()
        removed = vacuum(t, keep_last=10)
        dt = time.monotonic() - t0
        # exactness: survivors == exactly what kept manifests reference
        kept = _manifests(t)
        ref_data, ref_dv, ref_eq = set(), set(), set()
        for v in kept:
            m = _load_manifest(t, v)
            ref_data.update(os.path.basename(d) for d in m["dirs"])
            for ent in (m.get("dv") or {}).values():
                ref_dv.update(os.path.basename(r) for r in ent["refs"])
            for entry in m.get("eqdel") or []:
                ref_eq.add(os.path.basename(entry["ref"]))
        assert set(os.listdir(data_root)) == ref_data
        assert set(os.listdir(dv_root)) == ref_dv
        assert set(os.listdir(eq_root)) == ref_eq
        assert len(kept) == 10
        results.append((n_versions, n_dirs, removed, dt))
        shutil.rmtree(t, ignore_errors=True)
    pts = ", ".join(
        f"{nv}v/{nd}d removed={rm} in {dt:.2f}s"
        for nv, nd, rm, dt in results
    )
    print(f"vacuum_sweep: {pts}")




def probe_branch(spark, sf_dir: str) -> None:
    """Branch/WAP claim: forking a branch is O(metadata) (one manifest
    JSON — independent of table size) and publish_branch is O(branch
    commits) (renames + one manifest — zero data bytes copied,
    independent of PARENT size). Builds versioned orders tables from
    1x/4x/16x key-shifted commits, runs one WAP cycle per scale (fork,
    append a fixed ~1/64 batch, dv-delete ~64 scattered rows, publish)
    and reports fork/publish wall-clock plus the bytes the PUBLISH
    step itself added to the table subtree (manifest-only if the
    zero-copy claim holds; the renames move bytes, never copy them).
    Read-back pins correctness at every scale."""
    import os
    import tempfile
    import time as _t

    from pyspark.sql import functions as F

    from polygon_daily_market_data_pipeline_spark.operators.versioned import (
        commit_version,
        create_branch,
        delete_version_vectors,
        publish_branch,
        read_version,
    )
    from polygon_daily_market_data_pipeline_spark.sources.tables import load_table

    def tree_bytes(path: str) -> int:
        total = 0
        for root, _dirs, files in os.walk(path):
            total += sum(
                os.path.getsize(os.path.join(root, f))
                for f in files
                if not f.startswith(".")
            )
        return total

    ord_df = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    ).persist()
    n = ord_df.count()
    off = 10 ** len(str(n * 20))
    batch = ord_df.limit(max(1, n // 64)).withColumn(
        "o_orderkey", (F.col("o_orderkey") + F.lit(99 * off)).cast("long")
    ).persist()
    nb = batch.count()
    step = max(1, n // 64)
    for k in (1, 4, 16):
        t = tempfile.mkdtemp(prefix=f"branch_probe_{k}x_")
        for i in range(k):
            commit_version(
                ord_df.withColumn(
                    "o_orderkey",
                    (F.col("o_orderkey") + F.lit(i * off)).cast("long"),
                ).repartitionByRange(8, "o_orderkey"),
                t,
                mode="append" if i else "overwrite",
                stats_cols=["o_orderkey"],
            )
        t0 = _t.monotonic()
        b = create_branch(t, "wap")
        t_fork = _t.monotonic() - t0
        commit_version(batch, b, mode="append", stats_cols=["o_orderkey"])
        # scattered dv delete across EVERY parent commit dir
        delete_version_vectors(
            spark, b, (F.col("o_orderkey") % off) % step == 0
        )
        n_del = k * -(-n // step)  # ceil(n/step) matches per commit
        before = tree_bytes(t)
        t0 = _t.monotonic()
        publish_branch(t, "wap")
        t_pub = _t.monotonic() - t0
        pub_bytes = tree_bytes(t) - before
        got = read_version(spark, t).count()
        want = k * n + nb - n_del - -(-nb // step)  # batch rows match too
        ok = "ok" if got == want else f"MISMATCH want {want}"
        print(
            f"branch {k}x({k * n}r): fork={t_fork * 1000:.1f}ms "
            f"publish={t_pub:.2f}s publish_bytes={pub_bytes / 1024:.1f}KB "
            f"readback={got} {ok}"
        )
    # second axis: parent fixed, BRANCH COMMIT COUNT grows — publish is
    # one rename per branch commit + one manifest, so wall-clock should
    # track the commit count (and stay trivially small)
    k = 4
    for n_commits in (1, 4, 16):
        t = tempfile.mkdtemp(prefix=f"branch_probe_c{n_commits}_")
        for i in range(k):
            commit_version(
                ord_df.withColumn(
                    "o_orderkey",
                    (F.col("o_orderkey") + F.lit(i * off)).cast("long"),
                ).repartitionByRange(8, "o_orderkey"),
                t,
                mode="append" if i else "overwrite",
                stats_cols=["o_orderkey"],
            )
        b = create_branch(t, "wap")
        for j in range(n_commits):
            commit_version(
                batch.withColumn(
                    "o_orderkey",
                    (F.col("o_orderkey") + F.lit((j + 50) * off)).cast(
                        "long"
                    ),
                ),
                b,
                mode="append",
                stats_cols=["o_orderkey"],
            )
        t0 = _t.monotonic()
        publish_branch(t, "wap")
        t_pub = _t.monotonic() - t0
        got = read_version(spark, t).count()
        want = k * n + n_commits * nb
        ok = "ok" if got == want else f"MISMATCH want {want}"
        print(
            f"branch-commits {n_commits}: publish={t_pub * 1000:.1f}ms "
            f"readback={got} {ok}"
        )
    ord_df.unpersist()
    batch.unpersist()

def probe_analyze(spark, sf_dir: str) -> None:
    """ANALYZE/DESCRIBE claim (round 11): ANALYZE is one scan — its
    cost grows ~linearly with rows (the KMV jobs are distinct-shuffles
    with k-bounded collects) — while DESCRIBE afterwards is
    metadata-only: flat sub-second driver latency independent of table
    size (the only Spark job is collecting the |columns|-row result),
    with n_rows from fast_count's manifest walk. Builds orders-derived
    tables at 1x/4x/16x (key-shifted self-union), absorbs session
    warmup with a throwaway 1000-row analyze first, and reports both
    wall-clocks plus the describe read-back (n_rows asserted equal to
    the true count at every point)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from polygon_daily_market_data_pipeline_spark.operators.versioned import (
        analyze_version,
        commit_version,
        describe_statistics,
    )
    from polygon_daily_market_data_pipeline_spark.sources.tables import load_table

    base_df = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority", "o_orderstatus"
    )
    n = base_df.count()
    cols = ["o_custkey", "o_orderkey", "o_orderpriority", "o_orderstatus"]
    warm = tempfile.mkdtemp(prefix="analyze_probe_warm_")
    commit_version(base_df.limit(1000).coalesce(1), warm)
    analyze_version(spark, warm, cols, k=64)
    describe_statistics(spark, warm).collect()
    shutil.rmtree(warm, ignore_errors=True)
    results = []
    for k in (1, 4, 16):
        df = base_df
        for i in range(1, k):
            df = df.unionByName(
                base_df.withColumn(
                    "o_orderkey", F.col("o_orderkey") + F.lit(i * 10 * n)
                )
            )
        t = tempfile.mkdtemp(prefix=f"analyze_probe_{k}x_")
        commit_version(
            df.repartition(max(4, 2 * k)), t, stats_cols=["o_orderkey"]
        )
        t0 = time.monotonic()
        analyze_version(spark, t, cols, k=64)
        dt_analyze = time.monotonic() - t0
        t0 = time.monotonic()
        desc = describe_statistics(spark, t)
        rows = desc.collect()
        dt_describe = time.monotonic() - t0
        assert all(r.n_rows == n * k for r in rows), (k, rows)
        results.append((k, n * k, dt_analyze, dt_describe))
        shutil.rmtree(t, ignore_errors=True)
    pts = ", ".join(
        f"{k}x ({rows} rows) analyze={a:.2f}s describe={d * 1000:.0f}ms"
        for k, rows, a, d in results
    )
    slopes = ", ".join(
        f"{math.log(results[i + 1][2] / results[i][2], 4):.2f}"
        for i in range(len(results) - 1)
    )
    print(f"analyze_describe: {pts}; analyze scaling exponents [{slopes}]")

    # Incremental ANALYZE vs full rescan: a fixed-size daily append on
    # growing tables — the incremental cost must track the APPEND, the
    # full rescan the TABLE (the 100 TB lever). Values pinned identical.
    from polygon_daily_market_data_pipeline_spark.operators.versioned import (
        analyze_incremental,
    )

    day = base_df.limit(5000)
    inc_results = []
    for k in (1, 4, 16):
        df = base_df
        for i in range(1, k):
            df = df.unionByName(
                base_df.withColumn(
                    "o_orderkey", F.col("o_orderkey") + F.lit(i * 10 * n)
                )
            )
        t = tempfile.mkdtemp(prefix=f"inc_analyze_probe_{k}x_")
        commit_version(df.repartition(max(4, 2 * k)), t)
        analyze_version(spark, t, cols, k=64)
        commit_version(
            day.withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(100 * k * n)
            ).coalesce(1),
            t,
            mode="append",
        )
        t0 = time.monotonic()
        res = analyze_incremental(spark, t)
        dt_inc = time.monotonic() - t0
        assert res["mode"] == "incremental", res.get("mode")
        inc_rows = sorted(
            tuple(r) for r in describe_statistics(spark, t).collect()
        )
        t0 = time.monotonic()
        analyze_version(spark, t, cols, k=64)
        dt_full = time.monotonic() - t0
        full_rows = sorted(
            tuple(r) for r in describe_statistics(spark, t).collect()
        )
        assert inc_rows == full_rows, f"{k}x: incremental != full"
        inc_results.append((k, n * k, dt_inc, dt_full))
        shutil.rmtree(t, ignore_errors=True)
    pts = ", ".join(
        f"{k}x ({rows}+5000 rows) incremental={i_:.2f}s full={f_:.2f}s"
        for k, rows, i_, f_ in inc_results
    )
    print(f"analyze_incremental: {pts} (values pinned identical)")


def probe_cbo(spark, sf_dir: str) -> None:
    """Stats-driven planning + manifest-aggregate claim (round 12,
    VERDICT r11 #2/#3): the planner's inputs (fast_count rows, data-dir
    byte walk, sidecar NDV) and fast_aggregate's file-aligned rollup
    are METADATA-ONLY, so their driver latency stays ~flat as the table
    grows 1x/4x/16x, while the scan-based alternative (count + MIN/MAX
    aggregate job over the same table) grows with it. Values pinned:
    the metadata rollup equals the scan's numbers at every size, and
    the broadcast decision stays correct (rows exact at every size)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from polygon_daily_market_data_pipeline_spark.operators.cbo import (
        plan_join_with_stats,
        table_size_estimate,
    )
    from polygon_daily_market_data_pipeline_spark.operators.versioned import (
        analyze_version,
        commit_version,
        fast_aggregate,
        read_version,
    )
    from polygon_daily_market_data_pipeline_spark.sources.tables import load_table

    base_df = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    n = base_df.count()
    fact = base_df.limit(10000).localCheckpoint(eager=True)
    results = []
    for k in (1, 4, 16):
        df = base_df
        for i in range(1, k):
            df = df.unionByName(
                base_df.withColumn(
                    "o_orderkey", F.col("o_orderkey") + F.lit(i * 10 * n)
                )
            )
        t = tempfile.mkdtemp(prefix=f"cbo_probe_{k}x_")
        # the daily-append layout: key-disjoint commits make the
        # predicate below FILE-ALIGNED (each file wholly in or out) —
        # a straddling layout would correctly return None
        half = df.agg(F.max("o_orderkey")).first()[0] // 2
        commit_version(
            df.where(F.col("o_orderkey") <= half).repartitionByRange(
                max(2, k), "o_orderkey"
            ),
            t,
            stats_cols=["o_orderkey", "o_custkey"],
        )
        commit_version(
            df.where(F.col("o_orderkey") > half).repartitionByRange(
                max(2, k), "o_orderkey"
            ),
            t,
            mode="append",
            stats_cols=["o_orderkey", "o_custkey"],
        )
        analyze_version(spark, t, ["o_orderpriority"], k=64)
        # metadata path: estimate + plan + aligned rollup
        t0 = time.monotonic()
        est = table_size_estimate(t)
        _j, dec = plan_join_with_stats(
            spark, fact, t, "o_orderkey", broadcast_threshold_rows=10**9
        )
        agg = fast_aggregate(
            t, "o_custkey", predicate=("o_orderkey", None, half)
        )
        dt_meta = time.monotonic() - t0
        # scan path: the same numbers as Spark jobs
        t0 = time.monotonic()
        vt = read_version(spark, t)
        scan_rows = vt.count()
        truth = (
            vt.where(F.col("o_orderkey") <= half)
            .agg(F.count(F.lit(1)), F.min("o_custkey"), F.max("o_custkey"))
            .first()
        )
        dt_scan = time.monotonic() - t0
        assert est["rows"] == scan_rows == n * k
        assert dec["strategy"] == "broadcast" and dec["dim_rows"] == n * k
        assert agg is not None and (
            agg["count"], agg["min"], agg["max"]
        ) == tuple(truth), (k, agg, truth)
        results.append((k, n * k, dt_meta, dt_scan))
        shutil.rmtree(t, ignore_errors=True)
    pts = ", ".join(
        f"{k}x ({rows} rows) metadata={m * 1000:.0f}ms scan={s:.2f}s"
        for k, rows, m, s in results
    )
    print(f"cbo_fastagg: {pts} (values pinned equal at every size)")


def probe_ssjoin_state(spark, sf_dir: str) -> None:
    """Stream-stream join state-boundedness claim (round 12): the
    interval join's docstring says state is O(users × lookback), not
    O(stream) — the watermark plus the time-range condition evict a
    buffered row once it can no longer match. Feed a LONG stream (one
    micro-batch per 30-minute slice of synthetic clicks/views, time-
    ordered — the production arrival order) and read the state-store
    row counts from the query progress after every micro-batch: total
    state must PLATEAU at a few slices' worth of rows while the total
    rows fed grow linearly. Without eviction state would end at
    ~rows_fed; the plateau is the 100 TB viability proof."""
    import datetime as dt
    import os
    import shutil
    import tempfile

    from polygon_daily_market_data_pipeline_spark.streaming.events_stream import (
        interval_join_stream,
    )

    n_slices, per_slice = 24, 400  # 12 hours of 30-min slices
    base = dt.datetime(2024, 1, 1)
    src = tempfile.mkdtemp(prefix="ssjoin_state_probe_")
    for s in range(n_slices):
        rows = []
        for i in range(per_slice):
            t = base + dt.timedelta(minutes=30 * s, seconds=i * 4)
            # (i // 2) % 50: click i and its neighboring views share a
            # user (plain i % 50 would give the two types disjoint
            # user sets — odd vs even residues — and zero pairs)
            rows.append((s * per_slice + i, t, (i // 2) % 50,
                         "click" if i % 2 else "view", float(i), "{}"))
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        ).coalesce(1).write.parquet(os.path.join(src, f"b{s:03d}"))

    def source():
        return (
            spark.readStream.schema(
                "event_id long, ts timestamp, user_id long, "
                "event_type string, value double, props string"
            )
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .option("pathGlobFilter", "*.parquet")
            .parquet(src)
        )

    joined = interval_join_stream(
        source().where("event_type = 'click'"),
        source().where("event_type = 'view'"),
        lookback="10 minutes",
        watermark="0 seconds",
    )
    before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    ckpt = tempfile.mkdtemp(prefix="ckpt_ssjoin_probe_")
    try:
        q = (
            joined.writeStream.format("memory")
            .queryName("ssjoin_state_probe")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        progress = q.recentProgress
        n_pairs = spark.table("ssjoin_state_probe").count()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
    state_rows = [
        p["stateOperators"][0]["numRowsTotal"]
        for p in progress
        if p.get("stateOperators")
    ]
    fed = n_slices * per_slice
    assert state_rows, "no state-operator progress recorded — probe shape broken"
    peak, final = max(state_rows), state_rows[-1]
    print(
        f"ssjoin_state: fed={fed} rows over {n_slices} micro-batches, "
        f"pairs={n_pairs}, state per batch={state_rows}, "
        f"peak={peak}, final={final}"
    )
    assert n_pairs > 0, "degenerate probe: the join produced no pairs"
    assert peak < fed / 3, (
        f"state peak {peak} not bounded vs {fed} rows fed — eviction broken?"
    )


def probe_star_salt(spark, sf_dir: str) -> None:
    """Round-13 probe: (a) plan_star_join's ordering decision is a
    METADATA read — flat driver ms as the dims grow 1x/4x/16x — and
    the order provably follows the stats (flips when the small dim
    outgrows the other); (b) the auto-salted join removes the
    straggling reducer STRUCTURALLY: on a one-hot-key fact the max
    per-output-partition row count drops ~n_salts-fold vs the plain
    hinted merge join, with row-identical output. Partition row counts
    — not wall-clock — are the metric, so the A/B is VM-noise-proof.
    AQE is disabled inside the A/B to isolate OUR mechanism (in
    production the two compose: the salt bounds the reducer key mass
    before AQE ever sees a partition)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from polygon_daily_market_data_pipeline_spark.operators.cbo import (
        plan_join_with_stats,
        plan_star_join,
    )
    from polygon_daily_market_data_pipeline_spark.operators.versioned import (
        analyze_incremental,
        analyze_version,
        commit_version,
        read_version,
    )

    # --- (a) star ordering: metadata-flat, stats-following ---------
    pdir = tempfile.mkdtemp(prefix="star_dim_p_")
    sdir = tempfile.mkdtemp(prefix="star_dim_s_")
    fdir = tempfile.mkdtemp(prefix="star_fact_")
    fact_df = spark.range(0, 200_000).select(
        (F.col("id") % 7).cast("string").alias("pk"),
        (F.col("id") % 3).cast("string").alias("sk"),
        F.col("id").alias("v"),
    )
    commit_version(fact_df.coalesce(4), fdir, stats_cols=["v"])
    analyze_version(spark, fdir, ["pk", "sk"], k=64)
    commit_version(
        spark.createDataFrame(
            [(str(i), i) for i in range(7)], "pk string, pw long"
        ),
        pdir, stats_cols=["pk"],
    )
    analyze_version(spark, pdir, ["pk"], k=64)
    commit_version(
        spark.createDataFrame(
            [(str(i), i) for i in range(3)], "sk string, sw long"
        ),
        sdir, stats_cols=["sk"],
    )
    analyze_version(spark, sdir, ["sk"], k=64)
    fact = read_version(spark, fdir)
    dims = [(pdir, "pk"), (sdir, "sk")]
    lat = []
    orders = []
    for k in (1, 4, 16):
        if k > 1:  # grow the S dim (never-matching keys)
            commit_version(
                spark.createDataFrame(
                    [(f"zz{k}_{i}", 0) for i in range(3 * k)],
                    "sk string, sw long",
                ),
                sdir, mode="append", stats_cols=["sk"],
            )
            analyze_incremental(spark, sdir)
        t0 = time.monotonic()
        _j, d = plan_star_join(
            spark, fact, dims, broadcast_threshold_rows=10**6,
            fact_dir=fdir,
        )
        lat.append((k, (time.monotonic() - t0) * 1000))
        orders.append(d["order"])
    assert orders[0] == [1, 0] and orders[-1] == [0, 1], orders
    print(
        "star_order: "
        + ", ".join(f"{k}x plan={ms:.0f}ms" for k, ms in lat)
        + f" (order {orders[0]} -> {orders[-1]}: flipped with the stats;"
        " planning is a metadata walk, flat at any table size)"
    )

    # --- (b) auto-salt straggler A/B ---------------------------------
    hot = spark.range(0, 240_000).select(
        F.lit("hot").alias("k"), F.col("id").alias("v")
    )
    tail = spark.range(0, 60_000).select(
        F.concat(F.lit("c"), (F.col("id") % 3000)).alias("k"),
        F.col("id").alias("v"),
    )
    hfdir = tempfile.mkdtemp(prefix="salt_fact_")
    hddir = tempfile.mkdtemp(prefix="salt_dim_")
    commit_version(hot.unionByName(tail).coalesce(8), hfdir, stats_cols=["v"])
    analyze_version(spark, hfdir, ["k"], k=64)
    commit_version(
        spark.createDataFrame(
            [("hot", 1)] + [(f"c{i}", 1) for i in range(3000)],
            "k string, w long",
        ).coalesce(1),
        hddir, stats_cols=["k"],
    )
    analyze_version(spark, hddir, ["k"], k=64)
    hfact = read_version(spark, hfdir)
    # AQE off for the measurement: its skew splitting would mask our
    # mechanism, and its partition COALESCING merges the small probe
    # output into one partition, destroying the per-reducer metric (at
    # probe scale everything fits one 64MB advisory partition). In
    # production the mechanisms compose; here we isolate the salt.
    before_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        stats = {}
        for mode, auto in (("plain", False), ("salted", True)):
            j, d = plan_join_with_stats(
                spark, hfact, hddir, "k",
                broadcast_threshold_rows=16,  # dim(3001) must shuffle
                fact_dir=hfdir, auto_salt=auto, n_salts=8,
            )
            assert d["strategy"] == "merge" and d["salted"] == auto
            t0 = time.monotonic()
            sizes = [
                r["count"]
                for r in j.withColumn("pid", F.spark_partition_id())
                .groupBy("pid").count().collect()
            ]
            stats[mode] = (max(sizes), sum(sizes), time.monotonic() - t0)
        assert stats["plain"][1] == stats["salted"][1]  # row-identical
        assert stats["salted"][0] < stats["plain"][0] / 3, stats
        print(
            f"auto_salt: plain max-reducer-rows={stats['plain'][0]} "
            f"({stats['plain'][2]:.2f}s) vs salted={stats['salted'][0]} "
            f"({stats['salted'][2]:.2f}s), total rows "
            f"{stats['plain'][1]} both — hot key fanned over 8 reducers"
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", before_aqe)
    for t in (pdir, sdir, fdir, hfdir, hddir):
        shutil.rmtree(t, ignore_errors=True)


def probe_span_bloom(spark, sf_dir: str) -> None:
    """Round-13 probe (VERDICT r12 #7): the span-dedup Bloom prefilter
    cuts the duplicate-detection shuffle's INPUT — the structural
    metric is rows entering the exact count_distinct groupBy (each row
    a 32-char md5 + doc id + position, so bytes scale with rows),
    plain vs bloomed, plus value equality of the final stats on the
    same corpus. One extra linear map pass buys the reduction; on a
    mostly-unique corpus (the common case) the duplicate shuffle
    drops to the boilerplate fraction plus bloom fpp."""
    from pyspark.sql import functions as F

    from polygon_daily_market_data_pipeline_spark.functions.text import (
        tokens,
    )
    from polygon_daily_market_data_pipeline_spark.operators.text_dedup import (
        _span_bloom_filter,
        _span_dup_bloom,
        repeated_span_stats,
    )

    docs, rows = scaled_docs(spark, sf_dir, 1)
    docs = docs.select("doc_id", "text")
    window = 25
    wins = docs.select(
        "doc_id", tokens("text").alias("toks")
    ).where(F.size("toks") >= window).select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size(toks) - {window}), "
                f"s -> md5(concat_ws(' ', slice(toks, s + 1, {window}))))"
            )
        ).alias("start", "h"),
    ).persist()
    n_all = wins.count()
    m_bits = 1 << 24
    t0 = time.monotonic()
    bloom = _span_dup_bloom(wins, m_bits)
    n_cand = _span_bloom_filter(wins, bloom, m_bits).count()
    dt_bloom = time.monotonic() - t0
    true_dup = (
        wins.groupBy("h").agg(F.count_distinct("doc_id").alias("nd"))
        .where("nd >= 2").count()
    )
    wins.unpersist()
    t0 = time.monotonic()
    a = sorted(
        tuple(r) for r in repeated_span_stats(docs, window=window).collect()
    )
    dt_plain = time.monotonic() - t0
    t0 = time.monotonic()
    b = sorted(
        tuple(r)
        for r in repeated_span_stats(
            docs, window=window, bloom_prefilter=True, bloom_bits=m_bits
        ).collect()
    )
    dt_bloomed = time.monotonic() - t0
    assert a == b, "bloom prefilter moved values"
    assert n_cand < n_all / 2, (n_cand, n_all)
    print(
        f"span_bloom: {rows} docs, window hashes {n_all} -> "
        f"{n_cand} into the exact dup groupBy "
        f"({100 * n_cand / max(n_all, 1):.1f}%; true dup hashes "
        f"{true_dup}); build+filter {dt_bloom:.2f}s; end-to-end "
        f"plain {dt_plain:.2f}s vs bloomed {dt_bloomed:.2f}s "
        f"(values equal)"
    )


def probe_lm_update(spark, sf_dir: str) -> None:
    """Round-13 probe (VERDICT r12 #5): extending the persisted bigram
    model with a FIXED batch costs O(batch) — flat as the stored model
    grows 1x/4x/16x — while a full retrain grows with the corpus. The
    update path appends only the batch's counts (log-structured; the
    scorer folds at read time), so the stored model is never read,
    rewritten, or shuffled. Exactness is separately a pytest law
    (integer counts: incremental == retrain bit-for-bit); this probe
    prices the deployment loop."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from polygon_daily_market_data_pipeline_spark.operators.lm_score import (
        train_bigram_model,
    )

    batch, _n = scaled_docs(spark, sf_dir, 1)
    batch = batch.limit(200).localCheckpoint(eager=True)
    # untimed warm-up (JVM codegen + parquet writer init): the 1x
    # point must not be startup cost
    wdir = tempfile.mkdtemp(prefix="lm_model_warm_")
    train_bigram_model(batch, wdir)
    shutil.rmtree(wdir, ignore_errors=True)
    pts = []
    for k in (1, 8, 64):
        corpus, rows = scaled_docs(spark, sf_dir, k)
        corpus.count()
        mdir = tempfile.mkdtemp(prefix=f"lm_model_{k}x_")
        t0 = time.monotonic()
        train_bigram_model(corpus, mdir)
        dt_train = time.monotonic() - t0
        t0 = time.monotonic()
        train_bigram_model(batch, mdir, mode="update")
        dt_update = time.monotonic() - t0
        pts.append((k, rows, dt_train, dt_update))
        corpus.unpersist()
        shutil.rmtree(mdir, ignore_errors=True)
        spark.catalog.clearCache()
    print(
        "lm_update: "
        + ", ".join(
            f"{k}x ({rows} docs) retrain={tr:.2f}s update={up:.2f}s"
            for k, rows, tr, up in pts
        )
        + " — update flat (O(batch) append), retrain grows with corpus"
    )
    assert pts[-1][3] < pts[-1][2], pts  # update beats retrain at 16x


def probe_matview(spark, sf_dir: str) -> None:
    """Round-13 probe: an incremental MV refresh prices O(delta), not
    O(source) — refreshing after a FIXED-size append stays flat while
    the source grows 1x/4x/16x, and the from-scratch create (the cost
    the view exists to avoid) grows with the source. Exactness is
    separately a pytest law (tests/test_matview.py: incremental ==
    scratch, stored-partial row equality); this probe prices the
    daily-load loop."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from polygon_daily_market_data_pipeline_spark.operators.matview import (
        create_matview,
        refresh_matview,
    )
    from polygon_daily_market_data_pipeline_spark.operators.versioned import (
        commit_version,
    )
    from polygon_daily_market_data_pipeline_spark.sources.tables import load_table

    ords = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(18,2)").alias("o_totalprice"),
    )
    n = ords.count()
    batch = ords.limit(500).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(10**12)
    ).localCheckpoint(eager=True)
    measures = {"n": ("count",), "money": ("sum", "o_totalprice")}
    pts = []
    warmed = False
    for k in (4, 16, 64):
        scaled = ords
        for i in range(1, k):
            scaled = scaled.unionByName(
                ords.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * n))
            )
        base = tempfile.mkdtemp(prefix=f"mv_probe_{k}x_")
        src = f"{base}/src"
        mv = f"{base}/mv"
        commit_version(scaled.repartition(16), src)
        if not warmed:  # untimed warm-up of BOTH paths (codegen +
            # writer init must not land in any timed point)
            create_matview(spark, f"{base}/warm", src, ["o_orderstatus"], measures)
            commit_version(batch, src, mode="append")
            refresh_matview(spark, f"{base}/warm")
            warmed = True
        t0 = time.monotonic()
        create_matview(spark, mv, src, ["o_orderstatus"], measures)
        dt_create = time.monotonic() - t0
        commit_version(batch, src, mode="append")
        t0 = time.monotonic()
        d = refresh_matview(spark, mv)
        dt_refresh = time.monotonic() - t0
        assert d["mode"] == "append" and not d["rescanned"]
        pts.append((k, n * k, dt_create, dt_refresh))
        shutil.rmtree(base, ignore_errors=True)
    print(
        "matview: "
        + ", ".join(
            f"{k}x ({rows} rows) create={cr:.2f}s refresh={rf:.2f}s"
            for k, rows, cr, rf in pts
        )
        + " — refresh flat (O(appended batch)), create grows with source"
    )
    assert pts[-1][3] < pts[-1][2], pts  # refresh beats create at 16x


def probe_dsir(spark, sf_dir: str) -> None:
    """Round-14 probe: DSIR importance resampling (two integer bigram
    LM passes + a distributed TakeOrdered selection,
    ``operators/lm_score.py``) is corpus-LINEAR — the per-doubling
    scaling exponent stays ≈1 as the raw corpus grows 1x/4x/16x with a
    fixed-size target. At 100 TB the cost is two map-side-combined
    count passes; nothing quadratic, nothing driver-sized beyond the
    broadcast LM counts."""
    from polygon_daily_market_data_pipeline_spark.operators.lm_score import (
        dsir_log_weights,
        dsir_select,
    )
    from polygon_daily_market_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    target = docs.where("doc_id % 31 = 4").localCheckpoint(eager=True)
    n = docs.count()
    pts = []
    warmed = False
    for k in (1, 4, 16):
        from pyspark.sql import functions as F

        scaled = docs
        for i in range(1, k):
            scaled = scaled.unionByName(
                docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * n))
            )
        scaled = scaled.repartition(32).persist()
        scaled.count()
        if not warmed:
            dsir_select(
                dsir_log_weights(scaled, target), 100
            ).count()  # codegen/worker warm-up, untimed
            warmed = True
        t0 = time.monotonic()
        got = dsir_select(dsir_log_weights(scaled, target), 100).count()
        dt = time.monotonic() - t0
        assert got == 100
        pts.append((k, n * k, dt))
        scaled.unpersist()
    slopes = [
        math.log(pts[i + 1][2] / pts[i][2], 4) for i in range(len(pts) - 1)
    ]
    print(
        "dsir: "
        + ", ".join(f"{k}x ({rows} rows) {dt:.2f}s" for k, rows, dt in pts)
        + " — per-4x exponents "
        + ", ".join(f"{s:.2f}" for s in slopes)
        + " (≈1 linear)"
    )


def probe_governance(spark, sf_dir: str) -> None:
    """Round-14 probe: a governed read (row policy + two masks,
    ``operators/governance.py``) is metadata-driven Catalyst
    projection/filter — its cost tracks the PLAIN read of the same
    versioned table as the table grows 1x/4x/16x (ratio ≈1, constant
    overhead), never a second scan or a per-row Python path."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from polygon_daily_market_data_pipeline_spark.operators.governance import (
        read_governed,
        set_masking_policy,
        set_row_access_policy,
    )
    from polygon_daily_market_data_pipeline_spark.operators.versioned import (
        commit_version,
        read_version,
    )
    from polygon_daily_market_data_pipeline_spark.sources.tables import load_table

    ords = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority",
        "o_totalprice",
    )
    n = ords.count()
    pts = []
    warmed = False
    for k in (1, 4, 16):
        scaled = ords
        for i in range(1, k):
            scaled = scaled.unionByName(
                ords.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * n))
            )
        base = tempfile.mkdtemp(prefix=f"gov_probe_{k}x_")
        tdir = f"{base}/t"
        commit_version(scaled.repartition(16), tdir)
        set_row_access_policy(spark, tdir, "f_only", "o_orderstatus = 'F'")
        set_masking_policy(spark, tdir, "o_custkey", "hash")
        set_masking_policy(spark, tdir, "o_orderpriority", "partial", arg=2)
        agg = [F.count(F.lit(1)), F.countDistinct("o_custkey")]
        if not warmed:
            read_governed(spark, tdir).agg(*agg).collect()
            read_version(spark, tdir).where("o_orderstatus = 'F'").agg(
                *agg
            ).collect()
            warmed = True
        t0 = time.monotonic()
        read_version(spark, tdir).where("o_orderstatus = 'F'").agg(
            *agg
        ).collect()
        dt_plain = time.monotonic() - t0
        t0 = time.monotonic()
        read_governed(spark, tdir).agg(*agg).collect()
        dt_gov = time.monotonic() - t0
        pts.append((k, n * k, dt_plain, dt_gov))
        shutil.rmtree(base, ignore_errors=True)
    print(
        "governance: "
        + ", ".join(
            f"{k}x ({rows} rows) plain={p:.2f}s governed={g:.2f}s"
            f" (x{g / p:.2f})"
            for k, rows, p, g in pts
        )
        + " — governed read tracks the plain filtered read"
    )


def probe_footer_stats(spark, sf_dir: str) -> None:
    """Round 15 (VERDICT r14 Next #8): the _collect_file_stats
    crossover. Below _FOOTER_FANOUT_MIN_FILES (64) footers are read in
    a driver loop (~ms metadata reads); above it a mapInPandas fan-out
    takes over (fixed ~1-2 s job cost amortized over many footers read
    where the files live). A/B BOTH paths at 16/64/256 files by
    pinning the threshold each way — the driver loop should win small
    commits, the fan-out should stop losing (and start winning) around
    the 64-file threshold, and the fan-out's cost should stay ~flat in
    file count while the driver loop grows linearly."""
    import shutil
    import tempfile
    import time as _time

    from pyspark.sql import functions as F

    from polygon_daily_market_data_pipeline_spark.operators import versioned as V

    # warm the Python worker pool so the first fan-out isn't pool spin-up
    spark.range(0, 64, 1, 32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    for n_files in (16, 64, 256):
        d = tempfile.mkdtemp(prefix=f"probe_footer_{n_files}_")
        try:
            (
                spark.range(0, n_files * 2000)
                .select(
                    F.col("id"), (F.col("id") % 97).alias("v")
                )
                .repartition(n_files)
                .write.mode("overwrite")
                .parquet(f"{d}/data")
            )
            line = [f"files={n_files}:"]
            for mode, thresh in (("driver", 1 << 30), ("fanout", 1)):
                old = V._FOOTER_FANOUT_MIN_FILES
                V._FOOTER_FANOUT_MIN_FILES = thresh
                try:
                    t0 = _time.monotonic()
                    out = V._collect_file_stats(
                        spark, d, f"{d}/data", ["id", "v"]
                    )
                    dt = _time.monotonic() - t0
                finally:
                    V._FOOTER_FANOUT_MIN_FILES = old
                assert len(out) == n_files, (len(out), n_files)
                line.append(f"{mode}={dt:.2f}s")
            print("footer_stats " + " ".join(line))
        finally:
            shutil.rmtree(d, ignore_errors=True)


def probe_heavy_hitters(spark, sf_dir: str) -> None:
    """Round 15 (VERDICT r14 Next #8): the exact-heavy-hitters
    candidate set must stay bounded by k·partitions — flat as rows
    grow — while wall time stays ~linear (two scans). Scales the
    orders key column 1x/4x/16x."""
    import time as _time

    from pyspark.sql import functions as F

    from polygon_daily_market_data_pipeline_spark.operators.skew import (
        heavy_hitters,
    )
    from polygon_daily_market_data_pipeline_spark.sources.tables import load_table

    base = load_table(spark, sf_dir, "orders").select("o_orderpriority")
    for k in (1, 4, 16):
        df = base
        for _ in range(k - 1):
            df = df.unionByName(base)
        df = df.repartition(32).persist()
        n = df.count()
        t0 = _time.monotonic()
        stats: dict = {}
        hh = heavy_hitters(df, "o_orderpriority", k=16, stats_out=stats)
        dt = _time.monotonic() - t0
        print(
            f"heavy_hitters {k}x({n}r)={dt:.2f}s "
            f"candidates={stats.get('n_candidates')} "
            f"(bound k*partitions={16 * 32}) hitters={len(hh)}"
        )
        df.unpersist()


def probe_salt(spark, sf_dir: str) -> None:
    """Round 15 (VERDICT r14 Next #8): hot_key_salted_join
    max-reducer-rows A/B at 1x/4x/16x. A synthetic 30%-hot key (3 of
    every 10 rows land on key 7) models the skew heavy_hitters would
    name; the salted plan fans the hot key over 8 reducers so the
    largest per-reducer key group drops ~8x while cold keys pay no
    replication. Reports the measured max single-key reducer load
    (unsalted) vs max (key, salt) load (salted) plus join wall time."""
    import time as _time

    from pyspark.sql import functions as F

    from polygon_daily_market_data_pipeline_spark.operators.skew import (
        hot_key_salted_join,
    )

    for k in (1, 4, 16):
        n = 200_000 * k
        big = (
            spark.range(0, n, 1, 32)
            .select(
                F.when(F.col("id") % 10 < 3, F.lit(7))
                .otherwise(F.col("id") % 1000)
                .cast("int")
                .alias("k"),
                F.col("id").alias("payload"),
            )
            .persist()
        )
        big.count()
        small = spark.range(0, 1000).select(
            F.col("id").cast("int").alias("k"),
            (F.col("id") * 2).alias("attr"),
        )
        # reducer-load shape: the largest key group with and without
        # the hot key fanned over 8 salts (the quantity that OOMs or
        # straggles a reducer at 100 TB)
        unsalted_max = (
            big.groupBy("k").count().agg(F.max("count")).first()[0]
        )
        salted_max = (
            big.withColumn(
                "_s",
                F.when(
                    F.col("k") == 7,
                    F.pmod(F.xxhash64("k", "payload"), F.lit(8)),
                ).otherwise(F.lit(0)),
            )
            .groupBy("k", "_s")
            .count()
            .agg(F.max("count"))
            .first()[0]
        )
        t0 = _time.monotonic()
        plain = big.join(small, "k").count()
        t1 = _time.monotonic()
        salted = hot_key_salted_join(big, small, ["k"], [7], n_salts=8)
        n_salted = salted.count()
        t2 = _time.monotonic()
        assert n_salted == plain, (n_salted, plain)
        print(
            f"hot_key_salted_join {k}x({n}r): max_reducer_rows "
            f"unsalted={unsalted_max} salted={salted_max} "
            f"(x{unsalted_max / max(salted_max, 1):.1f} relief) "
            f"plain={t1 - t0:.2f}s salted={t2 - t1:.2f}s"
        )
        big.unpersist()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or list(OPS)

    for extra, fn in (
        ("refresh_mv", probe_refresh),
        ("skipping", probe_skipping),
        ("scd2_stored", probe_scd2_stored),
        ("change_feed", probe_change_feed),
        ("merge", probe_merge),
        ("dv", probe_dv),
        ("update", probe_update),
        ("compact", probe_compact),
        ("bloom", probe_bloom),
        ("cdc", probe_cdc),
        ("expectations", probe_expectations),
        ("vacuum", probe_vacuum),
        ("branch", probe_branch),
        ("analyze", probe_analyze),
        ("cbo", probe_cbo),
        ("star_salt", probe_star_salt),
        ("span_bloom", probe_span_bloom),
        ("lm_update", probe_lm_update),
        ("matview", probe_matview),
        ("ssjoin_state", probe_ssjoin_state),
        ("dsir", probe_dsir),
        ("governance", probe_governance),
        ("footer_stats", probe_footer_stats),
        ("heavy_hitters", probe_heavy_hitters),
        ("salt", probe_salt),
    ):
        if extra in names:
            from polygon_daily_market_data_pipeline_spark.session import get_spark

            fn(get_spark("scaling-probe"), sf_dir)
            names = [n for n in names if n != extra]
    if not names:
        return

    from polygon_daily_market_data_pipeline_spark.session import get_spark

    spark = get_spark("scaling-probe")
    spark.sparkContext.setLogLevel("ERROR")

    for name in names:
        fn = OPS[name]
        # untimed warm-up: JVM codegen + Python pool + parquet footer
        # caches, so the 1x point is not startup cost
        warm, _ = scaled_docs(spark, sf_dir, 1)
        warm.count()
        fn(warm).write.format("noop").mode("overwrite").save()
        warm.unpersist()
        spark.catalog.clearCache()
        times = []
        for k in (1, 2, 4):
            docs, rows = scaled_docs(spark, sf_dir, k)
            docs.count()  # force the persist
            t0 = time.monotonic()
            fn(docs).write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
            times.append((k, rows, dt))
            docs.unpersist()
            # each scale gets fresh shingle caches, not the 1x one
            spark.catalog.clearCache()
        slopes = [
            math.log2(b[2] / a[2]) for a, b in zip(times, times[1:])
        ]
        pts = ", ".join(f"{k}x({rows}r)={dt:.2f}s" for k, rows, dt in times)
        print(
            f"{name}: {pts}  exponents: "
            + ", ".join(f"{s:.2f}" for s in slopes)
        )


if __name__ == "__main__":
    main()
