"""Property tests for the incremental-aggregate manifest log
(operators/incremental.py) under random interleavings of
refresh / invalidate / partition-replace / compaction / GC — the
mirror of tests/test_versioned_props.py's seeded op-sequence checker.

Two standing invariants after EVERY op:

1. CURRENT-reader correctness: ``read_aggregate`` equals a from-scratch
   aggregate over exactly the partitions ``covered_partitions`` reports
   (a dropped entry un-covers everything it covered — no partial or
   double contribution, ever).
2. PINNED-reader stability: a lazy frame obtained from
   ``read_aggregate`` BEFORE later ops keeps returning its pin-time
   values — compaction and invalidation retire the partial dirs it
   references under the time-based grace window instead of deleting
   them at publish (the round-6 ``_retire_and_publish`` contract, here
   exercised against randomized interleavings rather than the scripted
   unit cases).
"""

from __future__ import annotations

import os
import random

import pytest

from polygon_daily_market_data_pipeline_spark.operators.incremental import (
    _load_manifest,
    covered_partitions,
    invalidate_partitions,
    read_aggregate,
    refresh_aggregate,
)

MEASURES = {"n": ("count", "v"), "s": ("sum", "v"), "mx": ("max", "v")}


def _read_rows(df):
    return sorted((r.g, r.n, r.s, r.mx) for r in df.collect())


def _expected(part_data: dict[str, list], parts) -> list:
    agg: dict[str, tuple] = {}
    for p in parts:
        for g, v in part_data[p]:
            n, s, mx = agg.get(g, (0, 0, None))
            agg[g] = (n + 1, s + v, v if mx is None else max(mx, v))
    return sorted((g, n, s, mx) for g, (n, s, mx) in agg.items())


def test_random_refresh_invalidate_gc_pinned_reader(spark, tmp_path):
    """8 seeds × (2 bootstrap + 8 random ops) with compact_threshold=3,
    so compaction (and therefore retire+GC publishes) fire routinely
    inside the sequences."""
    for seed in range(8):
        rng = random.Random(100 + seed)
        fact = str(tmp_path / f"fact_{seed}")
        state = str(tmp_path / f"state_{seed}")
        os.makedirs(fact)
        part_data: dict[str, list] = {}
        next_p = 0

        def write_partition(pname: str, rows: list) -> None:
            spark.createDataFrame(rows, "g string, v long").coalesce(
                1
            ).write.mode("overwrite").parquet(os.path.join(fact, f"p={pname}"))

        def rand_rows() -> list:
            return [
                (rng.choice("abc"), rng.randrange(100))
                for _ in range(rng.randrange(1, 6))
            ]

        def refresh():
            return refresh_aggregate(
                spark, fact, state, ["g"], MEASURES, "p", compact_threshold=3
            )

        for _ in range(2):
            rows = rand_rows()
            part_data[str(next_p)] = rows
            write_partition(str(next_p), rows)
            next_p += 1
        refresh()
        pinned = read_aggregate(spark, state, ["g"], MEASURES)
        pinned_expect = _read_rows(pinned)

        for _step in range(8):
            op = rng.choice(["add", "refresh", "invalidate", "replace", "repin"])
            if op == "add":
                rows = rand_rows()
                part_data[str(next_p)] = rows
                write_partition(str(next_p), rows)
                next_p += 1
                refresh()  # cover the new partition
            elif op == "refresh":
                refresh()  # no-op when everything is covered
            elif op == "invalidate":
                targets = rng.sample(
                    sorted(part_data), k=rng.randint(1, len(part_data))
                )
                invalidate_partitions(state, [f"p={t}" for t in targets])
            elif op == "replace":
                # documented contract: invalidate BEFORE mutating a
                # covered partition, then rewrite; the next refresh
                # rescans whatever lost coverage
                t = rng.choice(sorted(part_data))
                invalidate_partitions(state, [f"p={t}"])
                rows = rand_rows()
                part_data[t] = rows
                write_partition(t, rows)
            else:  # repin: the held reader moves to the current state
                entries = _load_manifest(state)["entries"]
                if entries:
                    pinned = read_aggregate(spark, state, ["g"], MEASURES)
                    pinned_expect = _read_rows(pinned)

            # invariant 1: current reader == from-scratch aggregate over
            # exactly the covered partitions
            covered = {
                c.split("=", 1)[1] for c in covered_partitions(state)
            }
            entries = _load_manifest(state)["entries"]
            if entries:
                got = _read_rows(read_aggregate(spark, state, ["g"], MEASURES))
                assert got == _expected(part_data, covered), (
                    f"seed={seed} step={_step} op={op} covered={sorted(covered)}"
                )
            else:
                assert covered == set()
                with pytest.raises(FileNotFoundError):
                    read_aggregate(spark, state, ["g"], MEASURES)

            # invariant 2: the pinned lazy frame still returns its
            # pin-time values — its partial dirs are retired under the
            # default grace window, never deleted mid-sequence
            assert _read_rows(pinned) == pinned_expect, (
                f"seed={seed} step={_step} op={op} (pinned reader broken)"
            )


def test_zero_grace_reclaims_at_next_publish(spark, tmp_path):
    """The grace window is the ONLY thing keeping retired dirs alive:
    with retire_grace_s=0 a compacted-away/invalidated partial dir is
    removed at the next publish — proving the GC actually fires and the
    pinned-reader stability above is the grace at work, not leaked
    state."""
    fact = str(tmp_path / "fact")
    state = str(tmp_path / "state")
    os.makedirs(fact)
    for p in range(3):
        spark.createDataFrame(
            [("a", p), ("b", p + 1)], "g string, v long"
        ).coalesce(1).write.parquet(os.path.join(fact, f"p={p}"))
        refresh_aggregate(
            spark, fact, state, ["g"], MEASURES, "p",
            compact_threshold=1, retire_grace_s=0.0,
        )
    import time

    time.sleep(0.05)  # newest retirement ages past the zero grace
    spark.createDataFrame([("c", 9)], "g string, v long").coalesce(
        1
    ).write.parquet(os.path.join(fact, "p=9"))
    refresh_aggregate(
        spark, fact, state, ["g"], MEASURES, "p",
        compact_threshold=1, retire_grace_s=0.0,
    )
    live = {e["dir"] for e in _load_manifest(state)["entries"]}
    retired = set(_load_manifest(state).get("retired", {}))
    on_disk = {d for d in os.listdir(state) if d.startswith("partial-")}
    assert on_disk == live | retired
    # everything compacted down: exactly one live entry plus at most the
    # just-retired generation awaiting the NEXT publish
    assert len(live) == 1
    assert len(on_disk) <= 3
