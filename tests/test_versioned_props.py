"""Property tests for the versioned-table layer (operators/versioned.py)
under crash, concurrency, and random op interleavings — the manifest
log's contract is that a published version is IMMUTABLE and readable
until vacuumed, no matter what later commits/rollbacks/optimizes do.
"""

from __future__ import annotations

import os
import random

import pytest
from pyspark.sql import functions as F

from polygon_daily_market_data_pipeline_spark.operators.versioned import (
    _publish_manifest,
    commit_version,
    history,
    optimize_zorder,
    read_version,
    rollback,
    vacuum,
)


def _df(spark, tag: int, n: int = 4):
    return spark.range(n).select(
        F.col("id").cast("long").alias("k"),
        F.lit(tag).cast("long").alias("tag"),
        (F.col("id") * 10 + tag).cast("double").alias("v"),
    )


def _rows(df):
    return sorted((r.k, r.tag, r.v) for r in df.collect())


def test_concurrent_publish_loser_gets_error(spark, tmp_path):
    """Two writers racing to the same version number: the second publish
    must raise FileExistsError, never silently replace the first
    (os.rename would atomic-replace; the os.link publish fails)."""
    t = str(tmp_path / "vt")
    v0 = commit_version(_df(spark, 0), t)
    assert v0 == 0
    with pytest.raises(FileExistsError, match="already committed"):
        _publish_manifest(t, 0, {"version": 0, "committed_at": "x", "mode": "overwrite", "dirs": []})
    # the winner's data is untouched
    assert _rows(read_version(spark, t, version=0)) == _rows(_df(spark, 0))
    # and the loser's temp file did not leak into the version listing
    assert [h["version"] for h in history(t)] == [0]


def test_optimize_expected_version_precondition(spark, tmp_path):
    """optimize_zorder(expected_version=...) fails BEFORE the rewrite
    when a concurrent append moved the table on; without the
    precondition the publish itself still fails rather than dropping
    the append."""
    t = str(tmp_path / "vt")
    commit_version(_df(spark, 0), t)
    commit_version(_df(spark, 1), t, mode="append")  # concurrent appender won
    with pytest.raises(FileExistsError, match="expected latest version 0"):
        optimize_zorder(spark, t, ["k", "v"], n_files=2, expected_version=0)
    # no debris version was created by the failed optimize
    assert [h["version"] for h in history(t)] == [0, 1]
    # with the right expectation it succeeds and preserves rows
    v2 = optimize_zorder(spark, t, ["k", "v"], n_files=2, expected_version=1)
    assert _rows(read_version(spark, t, version=v2)) == _rows(
        _df(spark, 0).unionByName(_df(spark, 1))
    )


def test_crash_debris_is_invisible_and_vacuumable(spark, tmp_path):
    """A crashed writer (data dir written, manifest never published)
    must not affect readers, and vacuum reclaims the debris without
    touching any kept version's dirs."""
    t = str(tmp_path / "vt")
    commit_version(_df(spark, 0), t)
    commit_version(_df(spark, 1), t, mode="append")
    # crashed commit: data landed, manifest missing
    debris = os.path.join(t, "_data", "v99-deadbeef")
    _df(spark, 99).write.parquet(debris)
    before = _rows(read_version(spark, t))
    assert _rows(read_version(spark, t)) == before
    removed = vacuum(t, keep_last=2)
    assert removed == 1 and not os.path.exists(debris)
    # both kept versions still fully readable after vacuum
    assert _rows(read_version(spark, t, version=0)) == _rows(_df(spark, 0))
    assert _rows(read_version(spark, t, version=1)) == before


def test_random_op_sequences_pinned_reader_invariant(spark, tmp_path):
    """Seeded random interleavings of commit/append/rollback/optimize/
    delete/update/merge/vacuum with a model checker: after EVERY op,
    every still-kept version must read back exactly the rows the model
    says it had when published (pinned-reader immutability —
    copy-on-write mutations must never disturb an earlier version), and
    vacuumed versions must raise instead of returning wrong data. 10
    seeds × 10 ops = 100 randomized operations."""
    from pyspark.sql import functions as F

    from polygon_daily_market_data_pipeline_spark.operators.versioned import (
        delete_version_keys,
        delete_version_vectors,
        delete_version_where,
        materialize_dv,
        fast_count,
        merge_version,
        optimize_compact,
        update_version_vectors,
        update_version_where,
    )

    for seed in range(10):
        rng = random.Random(seed)
        t = str(tmp_path / f"vt_{seed}")
        model: dict[int, list] = {}  # version -> expected sorted rows
        tag = seed * 1000
        tag += 1
        v = commit_version(
            _df(spark, tag), t, stats_cols=["k"],
            partition_values={"t": tag},
        )
        model[v] = _rows(_df(spark, tag))
        ref_tags: dict[str, int] = {}  # tag name -> pinned version
        for _step in range(10):
            op = rng.choice(
                [
                    "overwrite", "append", "rollback", "optimize",
                    "delete", "update", "merge", "vacuum",
                    "delete_dv", "materialize_dv", "delete_eq",
                    "update_dv", "compact", "constraint",
                    "branch_wap", "tag", "analyze",
                ]
            )
            versions = sorted(model)
            if op == "overwrite":
                tag += 1
                v = commit_version(
                    _df(spark, tag), t, stats_cols=["k"],
                    partition_values={"t": tag},
                )
                model[v] = _rows(_df(spark, tag))
            elif op == "append":
                tag += 1
                v = commit_version(
                    _df(spark, tag), t, mode="append", stats_cols=["k"],
                    partition_values={"t": tag},
                )
                model[v] = sorted(model[versions[-1]] + _rows(_df(spark, tag)))
            elif op == "rollback":
                src = rng.choice(versions)
                v = rollback(t, to_version=src)
                model[v] = model[src]
            elif op == "optimize":
                v = optimize_zorder(
                    spark, t, ["k", "v"], n_files=2,
                    expected_version=versions[-1],
                )
                model[v] = model[versions[-1]]
            elif op == "delete":
                bound = rng.randrange(0, 5)
                v = delete_version_where(
                    spark, t, F.col("k") < bound,
                    expected_version=versions[-1],
                )
                model[v] = [r for r in model[versions[-1]] if r[0] >= bound]
            elif op == "update":
                bound = rng.randrange(0, 5)
                v = update_version_where(
                    spark, t, F.col("k") >= bound, {"v": F.lit(-1.0)},
                    expected_version=versions[-1],
                )
                model[v] = sorted(
                    (k, g, (-1.0 if k >= bound else val))
                    for k, g, val in model[versions[-1]]
                )
            elif op == "merge":
                # upsert keys b..5 of a fresh tag: k 0..3 may exist in
                # the table (possibly multiply, after appends) — ALL
                # matched rows are replaced by the one source row;
                # k 4, 5 are pure inserts (table frames have k < 4)
                tag += 1
                bound = rng.randrange(0, 5)
                src = _df(spark, tag, n=6).where(F.col("k") >= bound)
                v = merge_version(
                    spark, t, src, keys=["k"],
                    expected_version=versions[-1],
                    # strategy is a layout choice, never a semantics
                    # choice — the model must hold under either
                    strategy=rng.choice(["copy_on_write", "merge_on_read"]),
                )
                model[v] = sorted(
                    [r for r in model[versions[-1]] if r[0] < bound]
                    + _rows(src)
                )
            elif op == "delete_dv":
                # merge-on-read delete: same visible-rows law as the
                # copy-on-write delete, zero data files rewritten; a
                # predicate matching nothing publishes NOTHING
                bound = rng.randrange(0, 5)
                v = delete_version_vectors(
                    spark, t, F.col("k") < bound,
                    expected_version=versions[-1],
                )
                if v != versions[-1]:
                    model[v] = [
                        r for r in model[versions[-1]] if r[0] >= bound
                    ]
                else:
                    assert not any(
                        r[0] < bound for r in model[versions[-1]]
                    ), "no-op delete_dv but the model says rows matched"
            elif op == "materialize_dv":
                v = materialize_dv(
                    spark, t, expected_version=versions[-1]
                )
                if v != versions[-1]:  # no-op when nothing is vectored
                    model[v] = model[versions[-1]]
            elif op == "constraint":
                # metadata-only CHECK toggle: add_check validates the
                # visible rows then publishes; drop_check removes it.
                # Neither changes any version's row set — the model
                # carries forward. (All generated rows satisfy the
                # predicate, so enforcement never blocks later ops.)
                from polygon_daily_market_data_pipeline_spark.operators.versioned import (
                    add_check,
                    drop_check,
                )

                try:
                    v = add_check(spark, t, "prop_chk", "v > -1e9")
                except ValueError:  # already present: toggle off
                    v = drop_check(t, "prop_chk")
                model[v] = model[versions[-1]]
            elif op == "compact":
                # bin-packing relayout: same visible rows, folds any
                # pending row-level deletes for the dirs it rewrites
                v = optimize_compact(
                    spark, t, expected_version=versions[-1]
                )
                if v != versions[-1]:  # no-op when already compact
                    model[v] = model[versions[-1]]
            elif op == "update_dv":
                # merge-on-read update: same visible-rows law as the
                # copy-on-write update, zero directory rewrites
                bound = rng.randrange(0, 5)
                v = update_version_vectors(
                    spark, t, F.col("k") >= bound, {"v": F.lit(-2.0)},
                    expected_version=versions[-1],
                )
                if v != versions[-1]:
                    model[v] = sorted(
                        (k, g, (-2.0 if k >= bound else val))
                        for k, g, val in model[versions[-1]]
                    )
                else:
                    assert not any(
                        r[0] >= bound for r in model[versions[-1]]
                    ), "no-op update_dv but the model says rows matched"
            elif op == "delete_eq":
                # equality delete: key-list erasure, zero table IO at
                # commit, SCOPED to current dirs (later appends of the
                # same key survive — the model naturally captures this
                # because appends add rows after the delete's version)
                bound = rng.randrange(0, 5)
                kdf = spark.range(bound).select(
                    F.col("id").cast("long").alias("k")
                )
                v = delete_version_keys(
                    spark, t, kdf, ["k"], expected_version=versions[-1]
                )
                if v != versions[-1]:  # empty key frame publishes nothing
                    model[v] = [
                        r for r in model[versions[-1]] if r[0] >= bound
                    ]
            elif op == "branch_wap":
                # the write-audit-publish cycle as ONE model step: fork,
                # mutate the branch (invisible to the parent — checked
                # mid-cycle), then either publish (fast-forward: the
                # branch's final rows become the next version) or drop
                # (the model is untouched, as if nothing happened)
                from polygon_daily_market_data_pipeline_spark.operators.versioned import (
                    create_branch,
                    drop_branch,
                    publish_branch,
                )

                name = f"wap_{_step}"
                b = create_branch(t, name)
                tag += 1
                commit_version(
                    _df(spark, tag), b, mode="append", stats_cols=["k"],
                    partition_values={"t": tag},
                )
                branch_rows = sorted(
                    model[versions[-1]] + _rows(_df(spark, tag))
                )
                if rng.random() < 0.5:  # a row-level delete on the branch
                    bound = rng.randrange(0, 5)
                    delete_version_vectors(spark, b, F.col("k") < bound)
                    branch_rows = [r for r in branch_rows if r[0] >= bound]
                # branch commits are invisible to the parent until publish
                assert (
                    _rows(read_version(spark, t)) == model[versions[-1]]
                ), f"seed={seed} step={_step} branch leaked pre-publish"
                if rng.random() < 0.5:
                    v = publish_branch(t, name)
                    model[v] = branch_rows
                else:
                    drop_branch(t, name)
            elif op == "tag":
                from polygon_daily_market_data_pipeline_spark.operators.versioned import (
                    create_tag,
                )

                name = f"tag_{_step}"
                ref_tags[name] = create_tag(t, name, rng.choice(versions))
            elif op == "analyze":
                # ANALYZE + DESCRIBE are READ-ONLY against the model:
                # no version appears, and the statistics must agree
                # with the model's own rows at the latest version under
                # whatever delete/merge/compact debris the interleaving
                # left behind (the manifest-envelope fast path must
                # yield to the sidecar whenever dv/eqdel entries hide
                # stored rows)
                from polygon_daily_market_data_pipeline_spark.operators.versioned import (
                    _manifests,
                    analyze_version,
                    describe_statistics,
                )

                latest = versions[-1]
                analyze_version(spark, t, ["k", "tag"], k=8)
                desc = {
                    r["column"]: r
                    for r in describe_statistics(spark, t).collect()
                }
                assert _manifests(t)[-1] == latest, "analyze moved the table"
                rows_now = model[latest]
                for col, idx in (("k", 0), ("tag", 1)):
                    vals = [r[idx] for r in rows_now]
                    d = desc[col]
                    assert d.n_rows == len(rows_now), (seed, _step, col)
                    assert d.n_nulls == 0
                    assert d.ndv_k == min(8, len(set(vals)))
                    if d.ndv_k < 8:
                        assert d.ndv_est == len(set(vals))
                    if vals:
                        assert (d.min_val, d.max_val) == (
                            str(min(vals)), str(max(vals)),
                        ), (seed, _step, col)
                    else:
                        assert d.min_val is None and d.max_val is None
            else:  # vacuum
                keep = rng.randint(1, len(versions))
                vacuum(t, keep_last=keep)
                pinned = set(ref_tags.values())
                for old in versions[:-keep]:
                    if old in pinned:  # tagged: vacuum must keep it
                        continue
                    del model[old]
                    with pytest.raises(LookupError):
                        read_version(spark, t, version=old)
            for kept, expected in model.items():
                assert _rows(read_version(spark, t, version=kept)) == expected, (
                    f"seed={seed} step={_step} op={op} version={kept}"
                )
        # end-of-sequence safety invariants, whatever the interleaving:
        # an all-range partition predicate NEVER loses rows (dirs gain
        # and lose tags through rewrites — pruning must stay an
        # optimization), and the metadata-only count is None or exact
        latest = sorted(model)[-1]
        pruned = read_version(
            spark, t, partitions={"t": (None, None)}
        )
        assert _rows(pruned) == model[latest], f"seed={seed} partition prune"
        fc = fast_count(t)
        assert fc is None or fc == len(model[latest]), f"seed={seed} {fc}"


def test_vacuum_retention_window(spark, tmp_path):
    """vacuum(older_than=...) composes a time guard with the version
    floor: versions committed at/after the cutoff survive beyond
    keep_last; only versions failing BOTH guards are dropped."""
    import datetime as dtm
    import json
    import os

    t = str(tmp_path / "vt")
    for i in range(3):
        commit_version(_df(spark, i), t, mode="overwrite" if i == 0 else "append")
    # age v0 and v1 artificially (manifest edit, like the clock test)
    old = dtm.datetime.now(dtm.timezone.utc) - dtm.timedelta(days=30)
    for v in (0, 1):
        mpath = os.path.join(t, "_versions", f"{v}.json")
        m = json.load(open(mpath))
        m["committed_at"] = (old + dtm.timedelta(seconds=v)).isoformat()
        json.dump(m, open(mpath, "w"))
    # a cutoff older than everything: the time guard keeps ALL versions
    vacuum(t, keep_last=1, older_than=old - dtm.timedelta(days=1))
    assert [h["version"] for h in history(t)] == [0, 1, 2]
    # a 7-day retention: v0/v1 fail both guards and drop, v2 survives
    removed = vacuum(
        t, keep_last=1,
        older_than=dtm.datetime.now(dtm.timezone.utc) - dtm.timedelta(days=7),
    )
    assert [h["version"] for h in history(t)] == [2]
    assert removed == 0  # append-built: v2 still references every dir
    assert _rows(read_version(spark, t)) == sorted(
        _rows(_df(spark, 0)) + _rows(_df(spark, 1)) + _rows(_df(spark, 2))
    )
    for v in (0, 1):
        with pytest.raises(LookupError):
            read_version(spark, t, version=v)


def test_commit_timestamps_strictly_monotonic(spark, tmp_path):
    """Rapid commits must publish strictly-increasing committed_at
    instants, so AT-timestamp reads resolve each version unambiguously
    even when the clock does not advance between commits (forced here
    by pre-writing a manifest stamped in the future)."""
    import datetime as dt
    import json
    import os

    t = str(tmp_path / "vt")
    commit_version(_df(spark, 0), t)
    # simulate a coarse/stepped clock: v0's instant is in the future
    mpath = os.path.join(t, "_versions", "0.json")
    m = json.load(open(mpath))
    future = dt.datetime.now(dt.timezone.utc) + dt.timedelta(seconds=5)
    m["committed_at"] = future.isoformat()
    json.dump(m, open(mpath, "w"))

    commit_version(_df(spark, 1), t, mode="append")
    v2 = rollback(t, to_version=0)
    hs = history(t)
    stamps = [dt.datetime.fromisoformat(h["committed_at"]) for h in hs]
    assert stamps == sorted(stamps) and len(set(stamps)) == len(stamps), hs
    # AT each version's own instant resolves that version
    for h in hs:
        got = read_version(spark, t, as_of=h["committed_at"])
        want = read_version(spark, t, version=h["version"])
        assert _rows(got) == _rows(want), h
    assert v2 == 2


def test_append_schema_drift_rejected(spark, tmp_path):
    """An append whose frame schema differs from the table's must fail
    at commit (a mixed-schema version would make spark.read pick one
    file's schema and silently null the rest), while a matching append
    and a deliberate overwrite both succeed."""
    t = str(tmp_path / "vt")
    commit_version(_df(spark, 0), t)
    commit_version(_df(spark, 1), t, mode="append")  # same schema: fine
    drifted = _df(spark, 2).withColumn("extra", F.lit("x"))
    with pytest.raises(ValueError, match="schema mismatch"):
        commit_version(drifted, t, mode="append")
    assert [h["version"] for h in history(t)] == [0, 1]
    v = commit_version(drifted, t, mode="overwrite")  # explicit: allowed
    assert v == 2
    assert "extra" in read_version(spark, t).columns


def test_optimize_preserves_stream_replay_watermark(spark, tmp_path):
    """Compacting a streamed table (optimize_zorder) must carry the
    manifest's batch list: dropping it would reset
    versioned_stream_sink's replay watermark, so a batch replayed after
    the compaction would double-commit its rows."""
    from polygon_daily_market_data_pipeline_spark.operators.versioned import (
        last_committed_batch,
        versioned_stream_sink,
    )

    t = str(tmp_path / "vt")
    sink = versioned_stream_sink(t)
    sink(_df(spark, 0), batch_id=0)
    sink(_df(spark, 1), batch_id=1)
    assert last_committed_batch(t) == 1
    optimize_zorder(spark, t, ["k"], n_files=2, bits=4)
    assert last_committed_batch(t) == 1
    before = _rows(read_version(spark, t))
    sink(_df(spark, 1), batch_id=1)  # crash-replay after compaction
    assert _rows(read_version(spark, t)) == before


def test_append_retry_is_metadata_only_and_loses_no_rows(spark, tmp_path, monkeypatch):
    """Optimistic concurrency for appends: when a racer takes our
    version number between our data write and our publish, retries=1
    re-reads the new latest and re-publishes on top of it — both
    appends' rows land, nothing is rewritten. Without retries the loser
    still gets FileExistsError."""
    import polygon_daily_market_data_pipeline_spark.operators.versioned as V

    t = str(tmp_path / "vt")
    commit_version(_df(spark, 0), t)

    real_publish = V._publish_manifest
    state = {"raced": False}

    def racing_publish(table_dir, version, manifest):
        if not state["raced"] and manifest["mode"] == "append":
            state["raced"] = True
            V.commit_version(_df(spark, 7), table_dir, mode="append")  # racer wins
        return real_publish(table_dir, version, manifest)

    monkeypatch.setattr(V, "_publish_manifest", racing_publish)
    with pytest.raises(FileExistsError):
        V.commit_version(_df(spark, 1), t, mode="append")  # no retries

    state["raced"] = False
    v = V.commit_version(_df(spark, 2), t, mode="append", retries=1)
    assert v == len(history(t)) - 1
    got = _rows(read_version(spark, t))
    want = sorted(
        _rows(_df(spark, 0)) + _rows(_df(spark, 7)) * 2 + _rows(_df(spark, 2))
    )
    # racer committed twice (once per raced publish attempt above)
    assert got == want


def test_append_retry_refuses_redefining_winner(spark, tmp_path, monkeypatch):
    """Append retry must NOT land on top of a concurrent OVERWRITE (or
    rollback): the winner redefined the table and, for a streamed
    table, reset the max_batch watermark — retrying the append would
    resurrect dropped rows and re-establish a stale watermark. The
    loser gets FileExistsError even with retries available."""
    import polygon_daily_market_data_pipeline_spark.operators.versioned as V

    t = str(tmp_path / "vt")
    commit_version(_df(spark, 0), t)

    real_publish = V._publish_manifest
    state = {"raced": False}

    def racing_publish(table_dir, version, manifest):
        if not state["raced"] and manifest["mode"] == "append":
            state["raced"] = True
            V.commit_version(_df(spark, 7), table_dir, mode="overwrite")
        return real_publish(table_dir, version, manifest)

    monkeypatch.setattr(V, "_publish_manifest", racing_publish)
    with pytest.raises(FileExistsError, match="redefined the table"):
        V.commit_version(_df(spark, 1), t, mode="append", retries=3)
    # the overwrite's contents stand untouched
    assert _rows(read_version(spark, t)) == _rows(_df(spark, 7))


def test_append_retry_refuses_buried_redefinition(spark, tmp_path, monkeypatch):
    """The retry guard must vet EVERY intervening commit, not just the
    latest: if a racer lands an OVERWRITE and then an APPEND between
    two of our attempts, the latest manifest's mode is 'append' — a
    latest-only guard would pass and silently append on top of a
    redefined table (re-establishing rows/watermark semantics the
    overwrite meant to reset)."""
    import polygon_daily_market_data_pipeline_spark.operators.versioned as V

    t = str(tmp_path / "vt")
    commit_version(_df(spark, 0), t)

    real_publish = V._publish_manifest
    state = {"raced": False}

    def racing_publish(table_dir, version, manifest):
        if not state["raced"] and manifest["mode"] == "append":
            state["raced"] = True
            # overwrite, then bury it under an innocent-looking append
            V.commit_version(_df(spark, 7), table_dir, mode="overwrite")
            V.commit_version(_df(spark, 8), table_dir, mode="append")
        return real_publish(table_dir, version, manifest)

    monkeypatch.setattr(V, "_publish_manifest", racing_publish)
    with pytest.raises(FileExistsError, match="redefined the table"):
        V.commit_version(_df(spark, 1), t, mode="append", retries=3)
    # the redefinition (+ the racer's own append) stands untouched
    assert _rows(read_version(spark, t)) == sorted(
        _rows(_df(spark, 7)) + _rows(_df(spark, 8))
    )


def test_read_changes_append_feed(spark, tmp_path):
    """Change feed = exactly the rows appended in (from, to]: reads only
    the delta dirs (no diff job), optimize contributes nothing (same
    rows, new layout — and later appends on top of the optimized layout
    still feed correctly), and a redefining commit in range raises
    instead of returning wrong deltas."""
    from polygon_daily_market_data_pipeline_spark.operators.versioned import (
        read_changes,
    )

    t = str(tmp_path / "vt")
    commit_version(_df(spark, 0), t)                       # v0 overwrite
    commit_version(_df(spark, 1), t, mode="append")        # v1
    commit_version(_df(spark, 2), t, mode="append")        # v2
    assert _rows(read_changes(spark, t, 0)) == sorted(
        _rows(_df(spark, 1)) + _rows(_df(spark, 2))
    )
    assert _rows(read_changes(spark, t, 1, 2)) == _rows(_df(spark, 2))
    # empty range: schema preserved, zero rows
    empty = read_changes(spark, t, 2, 2)
    assert empty.count() == 0 and empty.columns == _df(spark, 0).columns
    # the feed reads ONLY the appended delta dirs, not the whole table
    assert len(read_changes(spark, t, 1, 2).inputFiles()) < len(
        read_version(spark, t).inputFiles()
    )
    v3 = optimize_zorder(spark, t, ["k"], n_files=2, bits=4)   # same rows
    assert _rows(read_changes(spark, t, 2, v3)) == []          # no new rows
    commit_version(_df(spark, 3), t, mode="append")            # v4 on top
    assert _rows(read_changes(spark, t, 2)) == _rows(_df(spark, 3))
    rollback(t, 0)                                             # v5 redefines
    with pytest.raises(ValueError, match="append-only"):
        read_changes(spark, t, 2)
    with pytest.raises(LookupError):
        read_changes(spark, t, 99)


def test_delete_version_copy_on_write(spark, tmp_path):
    """Copy-on-write DELETE: the new version equals latest minus the
    matching rows; directories that cannot contain matches (manifest
    stats + prune) are carried BY REFERENCE (identical file paths, no
    IO), stats survive so scan_version still prunes, the pre-delete
    version stays time-travelable (the audit/erasure-retention story),
    and the change feed refuses to cross the redefinition."""
    from pyspark.sql import functions as F

    from polygon_daily_market_data_pipeline_spark.operators.versioned import (
        delete_version_where,
        read_changes,
        read_version,
        scan_version_with_stats,
        vacuum,
    )

    t = str(tmp_path / "vt")

    def _k(lo, n=1000):
        return spark.range(lo, lo + n).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("grp")
        ).repartitionByRange(4, "k")

    commit_version(_k(0), t, stats_cols=["k"])
    v1 = commit_version(_k(1000), t, mode="append", stats_cols=["k"])
    before = set(read_version(spark, t).inputFiles())
    v2 = delete_version_where(
        spark,
        t,
        F.col("k") < 100,
        prune={"k": (None, 99)},
        stats_cols=["k"],
    )
    after = read_version(spark, t, version=v2)
    assert sorted(r.k for r in after.collect()) == list(range(100, 2000))
    # the append commit's files could not match: carried by reference
    carried = set(after.inputFiles()) & before
    assert len(carried) >= 4, "untouched directory was rewritten"
    # pre-delete version still fully readable (time travel / audit)
    assert read_version(spark, t, version=v1).count() == 2000
    # stats survive on carried AND rewritten files: a selective scan
    # of the new version still prunes
    df, st = scan_version_with_stats(spark, t, {"k": (1500, 1599)}, version=v2)
    assert st.files_scheduled < st.files_total
    assert df.count() == 100
    # the feed refuses to cross a delete — rows were redefined
    with pytest.raises(ValueError, match="append-only"):
        read_changes(spark, t, v1)
    # erasure completes at vacuum: pre-delete versions reclaimed
    vacuum(t, keep_last=1)
    with pytest.raises(LookupError):
        read_version(spark, t, version=0)


def test_update_version_copy_on_write(spark, tmp_path):
    """Copy-on-write UPDATE: matching rows get the assignment, others
    (and untouched directories) are byte-identical carries; row count
    is conserved; expected_version guards the read-rewrite race."""
    from pyspark.sql import functions as F

    from polygon_daily_market_data_pipeline_spark.operators.versioned import (
        read_version,
        update_version_where,
    )

    t = str(tmp_path / "vt")
    rows = spark.range(100).select(
        F.col("id").alias("k"), F.lit("ok").alias("status")
    ).repartitionByRange(4, "k")
    commit_version(rows, t, stats_cols=["k"])
    v1 = update_version_where(
        spark,
        t,
        F.col("k").between(10, 19),
        {"status": F.lit("bad")},
        prune={"k": (10, 19)},
        stats_cols=["k"],
    )
    got = {r.k: r.status for r in read_version(spark, t, version=v1).collect()}
    assert len(got) == 100
    assert all(v == "bad" for k, v in got.items() if 10 <= k <= 19)
    assert all(v == "ok" for k, v in got.items() if not 10 <= k <= 19)
    # string-expression assignments work too, and the precondition
    # fails cheaply when the table moved on
    with pytest.raises(FileExistsError, match="expected latest"):
        update_version_where(
            spark, t, F.col("k") < 5, {"status": "'x'"}, expected_version=0
        )
    v2 = update_version_where(
        spark, t, F.col("k") < 5, {"status": "'x'"}, expected_version=v1
    )
    got2 = {r.k: r.status for r in read_version(spark, t, version=v2).collect()}
    assert sum(1 for v in got2.values() if v == "x") == 5


def _race_writer(table_dir: str, wid: int, n_commits: int, q) -> None:
    """One OS process racing optimistic appends: read latest, publish
    version+1, retry on FileExistsError — the protocol every append
    retry in commit_version follows, reduced to the manifest layer so
    N real processes can hammer one table without a JVM each."""
    import json as _json
    import os as _os

    from polygon_daily_market_data_pipeline_spark.operators.versioned import (
        _manifests as _mf,
    )
    from polygon_daily_market_data_pipeline_spark.operators.versioned import (
        _publish_manifest as _pub,
    )

    committed = []
    for seq in range(n_commits):
        for _attempt in range(10_000):
            versions = _mf(table_dir)
            v = (versions[-1] + 1) if versions else 0
            try:
                _pub(
                    table_dir,
                    v,
                    {
                        "version": v,
                        "committed_at": "2024-01-01T00:00:00+00:00",
                        "mode": "append",
                        "dirs": [],
                        "writer": wid,
                        "seq": seq,
                        "pid": _os.getpid(),
                    },
                )
                committed.append((v, seq))
                break
            except FileExistsError:
                continue
        else:  # pragma: no cover
            raise AssertionError(f"writer {wid} starved at seq {seq}")
    q.put((wid, committed))


def test_multiprocess_commit_race_no_lost_commits(tmp_path):
    """The fail-if-exists publish (os.link, versioned.py) is the WHOLE
    concurrency story — so race it across real OS processes, not
    threads: 6 forked writers x 8 appends each on one table. Invariants:
    every (writer, seq) landed, every version number was won by exactly
    one writer, the version sequence is gapless 0..47, and each on-disk
    manifest's payload matches the writer that claims it (no torn or
    clobbered JSON)."""
    import json
    import multiprocessing as mp
    import os

    table = str(tmp_path / "race_vt")
    os.makedirs(os.path.join(table, "_versions"))
    n_writers, n_commits = 6, 8
    ctx = mp.get_context("fork")
    q = ctx.Queue()
    procs = [
        ctx.Process(target=_race_writer, args=(table, w, n_commits, q))
        for w in range(n_writers)
    ]
    for p in procs:
        p.start()
    results = [q.get(timeout=120) for _ in procs]
    for p in procs:
        p.join(timeout=120)
        assert p.exitcode == 0
    claimed: dict[int, tuple[int, int]] = {}
    for wid, committed in results:
        assert [s for _v, s in committed] == list(range(n_commits))
        for v, seq in committed:
            assert v not in claimed, f"version {v} won twice: {claimed[v]} and {(wid, seq)}"
            claimed[v] = (wid, seq)
    assert sorted(claimed) == list(range(n_writers * n_commits))
    for v, (wid, seq) in claimed.items():
        m = json.load(open(os.path.join(table, "_versions", f"{v}.json")))
        assert (m["writer"], m["seq"], m["version"]) == (wid, seq, v)
