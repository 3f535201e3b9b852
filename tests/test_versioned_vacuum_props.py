"""Vacuum exactness under random REAL op histories (VERDICT r8 #7).

The sweep's contract has two halves, and both must hold for ANY
reachable table state — vacuum reasons over data dirs, dv sidecars,
eqdel key lists, clone markers, and partition-retired dirs:

1. **No live file swept**: every kept version reads back exactly the
   rows it read before the vacuum.
2. **No orphan survives**: after the sweep, what's on disk under
   ``_data``/``_dv``/``_eqdel`` is EXACTLY the union of what the kept
   manifests reference — crash debris and aged-out sidecars included.

`test_random_op_sequences_pinned_reader_invariant` already checks the
read-back law inside its interleavings; this file pins the DISK-set
equality (the "deletions exact" half) and the clone-marker refusal,
which that test does not observe.
"""

from __future__ import annotations

import os
import random

import pytest
from pyspark.sql import functions as F

from polygon_daily_market_data_pipeline_spark.operators.versioned import (
    _load_manifest,
    _manifests,
    clone_table,
    rename_column,
    commit_version,
    delete_version_keys,
    delete_version_vectors,
    drop_clone,
    drop_partitions,
    materialize_dv,
    optimize_compact,
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
    # positional tuples, not attribute access: the random history
    # includes column renames, and a version's logical names depend on
    # where it sits relative to them — positions are stable
    return sorted(tuple(r) for r in df.collect())


def _disk(table_dir: str, sub: str) -> set:
    root = os.path.join(table_dir, sub)
    return set(os.listdir(root)) if os.path.isdir(root) else set()


def _referenced(table_dir: str):
    """(data, dv, eqdel) basenames referenced by ANY kept manifest —
    the exact survivor set vacuum's contract promises."""
    data, dv, eq = set(), set(), set()
    for v in _manifests(table_dir):
        m = _load_manifest(table_dir, v)
        data.update(os.path.basename(d) for d in m["dirs"])
        for ent in (m.get("dv") or {}).values():
            dv.update(
                os.path.basename(r)
                for r in ent["refs"]
                if not os.path.isabs(r)
            )
        for entry in m.get("eqdel") or []:
            if not os.path.isabs(entry["ref"]):
                eq.add(os.path.basename(entry["ref"]))
    return data, dv, eq


def test_vacuum_sweeps_exactly_unreferenced(spark, tmp_path):
    """Seeded random histories over append/overwrite/rollback/
    delete_dv/delete_eq/materialize/compact/drop_partitions, a planted
    crash-debris dir, then one vacuum at a random retention: kept
    versions read back unchanged, dropped ones raise, and the on-disk
    dir sets equal the kept manifests' reference sets EXACTLY."""
    for seed in range(6):
        rng = random.Random(1000 + seed)
        t = str(tmp_path / f"vt_{seed}")
        tag = seed * 100 + 1
        commit_version(
            _df(spark, tag), t, stats_cols=["k"], partition_values={"t": tag}
        )
        dropped_tags = set()
        for _step in range(8):
            op = rng.choice(
                [
                    "append", "overwrite", "rollback", "delete_dv",
                    "delete_eq", "materialize_dv", "compact",
                    "drop_partitions", "rename_roundtrip",
                ]
            )
            versions = _manifests(t)
            if op in ("append", "overwrite"):
                tag += 1
                commit_version(
                    _df(spark, tag), t, mode=op, stats_cols=["k"],
                    partition_values={"t": tag},
                )
                if op == "overwrite":
                    dropped_tags = set()
            elif op == "rollback":
                rollback(t, to_version=rng.choice(versions))
                # partition tags carry across rollback; the dropped-tag
                # tracker only guards drop_partitions no-ops below, so
                # reset conservatively
                dropped_tags = set()
            elif op == "delete_dv":
                delete_version_vectors(
                    spark, t, F.col("k") < rng.randrange(0, 5)
                )
            elif op == "delete_eq":
                kdf = spark.range(rng.randrange(0, 4)).select(
                    F.col("id").cast("long").alias("k")
                )
                delete_version_keys(spark, t, kdf, ["k"])
            elif op == "materialize_dv":
                materialize_dv(spark, t)
            elif op == "rename_roundtrip":
                # two metadata-only commits; the second renames BACK to
                # the column's own prior name (allowed) — files written
                # under either name must keep reading identically, and
                # vacuum must keep every era's dirs while referenced
                if "v" in {
                    f["name"]
                    for f in _load_manifest(t, _manifests(t)[-1])["schema"][
                        "fields"
                    ]
                }:
                    rename_column(t, "v", "vx")
                    rename_column(t, "vx", "v")
            elif op == "compact":
                optimize_compact(spark, t)
            else:  # drop_partitions: retire one still-live tagged dir
                m = _load_manifest(t, _manifests(t)[-1])
                live = sorted(
                    {
                        pv["t"]
                        for d, pv in (m.get("partitions") or {}).items()
                        if d in set(m["dirs"]) and "t" in pv
                    }
                    - dropped_tags
                )
                if live:
                    victim = rng.choice(live)
                    drop_partitions(t, {"t": victim})
                    dropped_tags.add(victim)
        # crash debris: a dir no manifest ever referenced
        debris = os.path.join(t, "_data", "zz-debris-crashed")
        os.mkdir(debris)
        with open(os.path.join(debris, "part-0.parquet"), "wb") as f:
            f.write(b"x" * 128)

        versions = _manifests(t)
        pre = {
            v: _rows(read_version(spark, t, version=v)) for v in versions
        }

        # a live shallow clone blocks the sweep; dropping it unblocks
        dst = str(tmp_path / f"clone_{seed}")
        clone_table(t, dst)
        with pytest.raises(RuntimeError, match="shallow clone"):
            vacuum(t, keep_last=1)
        drop_clone(t, dst)

        keep = rng.randint(1, len(versions))
        vacuum(t, keep_last=keep)

        kept = versions[-keep:]
        for v in kept:  # no live file swept
            assert _rows(read_version(spark, t, version=v)) == pre[v], (
                f"seed={seed} version={v} changed across vacuum"
            )
        for v in versions[:-keep]:
            with pytest.raises(LookupError):
                read_version(spark, t, version=v)
        # no orphan survives: disk == kept-manifest reference sets
        ref_data, ref_dv, ref_eq = _referenced(t)
        assert _disk(t, "_data") == ref_data, f"seed={seed} data orphans"
        assert _disk(t, "_dv") == ref_dv, f"seed={seed} dv orphans"
        assert _disk(t, "_eqdel") == ref_eq, f"seed={seed} eqdel orphans"
