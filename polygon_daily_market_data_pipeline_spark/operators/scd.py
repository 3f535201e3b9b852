"""SCD Type-2 dimension maintenance — keyed history with validity
ranges.

The reference's dimensions are Type-1 (MERGE overwrites attributes in
place — ``/root/reference/dags/sql/merge_dim_symbol.sql``-style
update-else-insert), so attribute history is lost. Type-2 keeps one row
per (business key, version): on change the current row is CLOSED
(``valid_to`` set, ``is_current`` false) and a new open row inserted.

Spark-first shape: one full-outer-free pass — the incoming batch joins
the CURRENT slice of the dimension (never the closed history, which at
100 TB is the bulk of the table), classifying each key as unchanged /
changed / new; closed history flows through untouched. One broadcast
or key shuffle on dimension-sized data; fact-sized data never enters.

Point-in-time lookup (``as_of``) is a range predicate on
(valid_from, valid_to] — the natural companion to the as-of join in
``operators/asof.py`` for late-arriving facts.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OPEN_END = dt.datetime(9999, 12, 31)


def scd2_init(
    source: DataFrame, keys: Sequence[str], effective: str
) -> DataFrame:
    """Bootstrap a Type-2 dimension from an initial attribute snapshot.
    ``effective`` is a timestamp column on the source (load/observation
    time)."""
    return source.select(
        *source.columns,
        F.col(effective).alias("valid_from"),
        F.lit(OPEN_END).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    ).drop(effective)


def scd2_merge(
    dim: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    tracked: Sequence[str],
    effective: str,
) -> DataFrame:
    """Merge an attribute snapshot into a Type-2 dimension.

    - key in both, any ``tracked`` column differs → close the current
      row at the source's ``effective`` timestamp and insert a new
      current row;
    - key in both, no tracked change → keep the current row (its
      ``valid_from`` is the FIRST time those values were seen);
    - key only in source → insert as new current row;
    - key only in dim → unchanged (no implicit deletes — retirement is
      an explicit tracked attribute, e.g. ``status='delisted'``).

    Closed history rows pass through untouched and unscanned logic-wise
    (one filter); only the current slice joins the batch. The caller
    dedups the source per key (same contract as ``merge_upsert``).

    The dimension's columns must be exactly ``keys`` + ``tracked`` +
    the three SCD columns: an attribute the merge doesn't track has no
    well-defined value on inserted rows (``scd2_init`` carries whatever
    the source had, but a merge can't), so it is rejected up front —
    list it in ``tracked`` or drop it before merging.
    """
    expected = set(keys) | set(tracked) | {"valid_from", "valid_to", "is_current"}
    extra = sorted(set(dim.columns) - expected)
    missing = sorted(expected - set(dim.columns))
    if extra or missing:
        raise ValueError(
            "scd2_merge: dim columns must be keys + tracked + "
            "(valid_from, valid_to, is_current); "
            f"unexpected={extra} missing={missing} — add untracked "
            "attributes to `tracked` or drop them before merging"
        )
    src_missing = sorted(
        (set(keys) | set(tracked) | {effective}) - set(source.columns)
    )
    if src_missing:
        raise ValueError(f"scd2_merge: source is missing columns {src_missing}")
    current = dim.where(F.col("is_current"))
    history = dim.where(~F.col("is_current"))

    src = source.select(
        F.lit(True).alias("__src_present"),
        *[F.col(k).alias(f"__src_{k}") for k in keys],
        *[F.col(c).alias(f"__src_{c}") for c in tracked],
        F.col(effective).alias("__src_effective"),
    )
    cond = [current[k].eqNullSafe(F.col(f"__src_{k}")) for k in keys]
    joined = current.join(src, cond, "full_outer")

    # presence markers, not key nullability: a legitimately-NULL
    # business key must not read as "row absent" (same null-safety
    # contract as merge_upsert's __src_present). The dim side's marker
    # is is_current — non-null True on every current row by
    # construction, null only when the full-outer join found no match.
    cur_present = current["is_current"].isNotNull()
    matched = F.col("__src_present").isNotNull() & cur_present
    changed = matched & ~F.struct(
        *[current[c] for c in tracked]
    ).eqNullSafe(F.struct(*[F.col(f"__src_{c}") for c in tracked]))
    src_only = F.col("__src_present").isNotNull() & ~cur_present

    dim_cols = dim.columns

    # current rows: unchanged keep as-is; changed become CLOSED
    def _kept_col(c: str):
        if c == "valid_to":
            return F.when(changed, F.col("__src_effective")).otherwise(current[c])
        if c == "is_current":
            return F.when(changed, F.lit(False)).otherwise(current[c])
        return current[c]

    kept_or_closed = joined.where(cur_present).select(
        *[_kept_col(c).alias(c) for c in dim_cols]
    )
    # new versions: changed keys + brand-new keys
    inserts = joined.where(changed | src_only).select(
        *[
            (
                F.col(f"__src_{c}")
                if c in list(keys) + list(tracked)
                else F.col("__src_effective")
                if c == "valid_from"
                else F.lit(OPEN_END).cast("timestamp")
                if c == "valid_to"
                else F.lit(True)
            ).alias(c)
            for c in dim_cols
        ]
    )
    return history.unionByName(kept_or_closed).unionByName(inserts)


def as_of(dim: DataFrame, ts) -> DataFrame:
    """The dimension as it was at ``ts``: the version whose
    (valid_from, valid_to] range covers the instant — a pure filter,
    partition-prunable when the table is laid out by valid_from."""
    t = F.lit(ts).cast("timestamp")
    return dim.where((F.col("valid_from") <= t) & (F.col("valid_to") > t))


# --- storage-aware form: append-only history, replace-only current --------
#
# ``scd2_merge`` is the LOGICAL merge: it returns the whole dimension,
# so persisting its result rewrites closed history that the merge never
# touched — fine for a frame-in/frame-out pipeline, wrong as a storage
# plan once history dwarfs the current slice. The stored form keeps
#
#     dim_dir/current/            one row per key (replaceable)
#     dim_dir/history/batch=<ts>-<hash>/ rows CLOSED by that batch (append-only)
#
# so a merge writes O(|current| + |batch|) bytes and history bytes are
# written exactly once, ever. Crash/replay contract (single writer,
# batches applied in effective-ts order): a batch's
# ``batch=<effective>-<content hash>`` delta directory is written at
# most once — once its ``_SUCCESS`` marker
# exists the content is FINAL (it was computed from the pre-batch
# current slice) and a rerun must NOT recompute it, because after the
# current swap the same batch recomputes an empty delta. Reruns
# therefore skip the delta write and only redo the current swap, which
# is idempotent by SCD semantics (re-applying a snapshot changes
# nothing). A crash mid-delta-write leaves no ``_SUCCESS`` and the
# rerun rewrites it from the still-unswapped current slice. This is the
# idempotent-replay story of the reference's FORCE=TRUE re-loads.
#
# Filesystem contract: the current-slice flip uses a symlink rename, so
# this layout targets POSIX filesystems (local disk, NFS, HDFS-with-
# symlinks). On object stores (no atomic rename/symlink) keep the same
# append-only-history idea but publish the current slice through a
# manifest log instead — ``operators/versioned.py`` is exactly that
# commit protocol and composes: store current as a versioned table,
# history as plain append-only prefixes.


def _hist_dir(dim_dir: str) -> str:
    import os

    return os.path.join(dim_dir, "history")


def _swap_current(dim_dir: str, new_data_dir: str) -> None:
    """Atomically repoint ``current`` (a symlink) at a freshly-written
    data directory: build a temp symlink, rename it over ``current`` —
    rename(2) replaces atomically, so a concurrent reader resolves
    either the old or the new slice, never a missing path.

    The JUST-retired slice is kept on disk until the NEXT swap: a
    reader resolves the symlink at file-listing time and reads the
    underlying files later, so deleting the old target at flip time
    would yank files out from under any in-flight scan. One retained
    generation covers every reader that started since the previous
    merge (the engine's merge cadence is daily; a scan outliving two
    merges has bigger problems). Older retired generations — and
    crash-orphaned ``current_*`` dirs that never got linked — are
    removed here."""
    import os
    import shutil
    import uuid

    link = os.path.join(dim_dir, "current")
    old_target = os.path.realpath(link) if os.path.lexists(link) else None
    tmp_link = os.path.join(dim_dir, f"_link_{uuid.uuid4().hex}")
    os.symlink(os.path.basename(new_data_dir), tmp_link)
    os.rename(tmp_link, link)
    keep = {os.path.basename(new_data_dir)}
    if old_target:
        keep.add(os.path.basename(old_target))
    for d in os.listdir(dim_dir):
        if d.startswith("current_") and d not in keep:
            shutil.rmtree(os.path.join(dim_dir, d), ignore_errors=True)


def scd2_store_init(
    source: DataFrame, dim_dir: str, keys: Sequence[str], effective: str
) -> None:
    """Bootstrap the stored layout from an initial snapshot."""
    import os
    import uuid

    os.makedirs(dim_dir, exist_ok=True)
    data = os.path.join(dim_dir, f"current_{uuid.uuid4().hex}")
    scd2_init(source, keys, effective).write.parquet(data)
    _swap_current(dim_dir, data)
    os.makedirs(_hist_dir(dim_dir), exist_ok=True)


def scd2_store_merge(
    spark,
    dim_dir: str,
    source: DataFrame,
    keys: Sequence[str],
    tracked: Sequence[str],
    effective: str,
) -> None:
    """Apply one snapshot batch to the stored dimension. Reads ONLY the
    current slice; appends the batch's closed rows as one immutable
    ``history/batch=<tag>`` delta; swaps the current slice via a temp
    dir + rename. Semantics are exactly ``scd2_merge`` restricted to a
    history-free dim (asserted by tests comparing against the logical
    merge).

    The delta dir tag is ``<max effective>-<content hash>``: the tag is
    the replay-dedup key (an existing ``_SUCCESS`` skips the delta
    write — see module comment), so it must identify the BATCH, not
    just its timestamp. Keyed on the timestamp alone, two distinct
    batches sharing a max effective ts (routine at date-granular
    effective columns) would collide: the second batch's closed rows
    would be silently dropped from history while its current swap still
    applied. The hash is an order-insensitive fold over the batch's
    key/tracked/effective values — one batch-sized aggregate."""
    import os
    import uuid

    current = spark.read.parquet(os.path.join(dim_dir, "current"))
    # scd2_merge on a history-free dim returns precisely
    # closed-delta ∪ new-current
    merged = scd2_merge(current, source, keys, tracked, effective)
    # pmod keeps each term in [0, 2^31) so the sum cannot overflow
    # int64 below ~2^33 rows/batch — a raw sum of int64 hashes throws
    # ARITHMETIC_OVERFLOW under Spark 4's default ANSI mode (this
    # module must work in sessions not built by session.py)
    sig = source.agg(
        F.max(effective).alias("eff"),
        F.sum(
            F.pmod(F.xxhash64(*keys, *tracked, effective), F.lit(2**31))
        ).alias("h"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    if sig["eff"] is None:
        return  # empty batch: dim unchanged, nothing to write
    content = (int(sig["h"] or 0) * 1_000_003 + sig["n"]) & (2**64 - 1)
    batch_tag = f"{sig['eff'].strftime('%Y%m%dT%H%M%S%f')}-{content:016x}"

    # both writes split one merge result: persist so the
    # current-vs-batch join and the source dedup run once, not twice
    merged = merged.persist()
    try:
        delta_dir = os.path.join(_hist_dir(dim_dir), f"batch={batch_tag}")
        if not os.path.exists(os.path.join(delta_dir, "_SUCCESS")):
            # first (or crash-replayed pre-swap) application: the closed
            # delta is computed from the pre-batch current slice. Once
            # _SUCCESS exists the delta is final — see module comment.
            closed = merged.where(~F.col("is_current"))
            closed.write.mode("overwrite").parquet(delta_dir)
        new_current = merged.where(F.col("is_current"))
        data = os.path.join(dim_dir, f"current_{uuid.uuid4().hex}")
        new_current.write.parquet(data)
        _swap_current(dim_dir, data)
    finally:
        merged.unpersist()


def scd2_store_read(spark, dim_dir: str) -> DataFrame:
    """The full Type-2 dimension (current ∪ all history deltas) —
    identical frame to the logical ``scd2_merge`` chain. History is ONE
    partition-discovered scan (``batch=<ts>`` is a partition column,
    dropped on read), not a per-delta union loop — thousands of batch
    deltas stay one scan node with partition pruning available on
    ``batch``. Deltas carry no duplicate rows by construction (each
    batch closes a row at most once, in its own directory)."""
    import os

    cur = spark.read.parquet(os.path.join(dim_dir, "current"))
    hist_root = _hist_dir(dim_dir)
    has_delta = any(d.startswith("batch=") for d in os.listdir(hist_root))
    if not has_delta:
        return cur
    hist = spark.read.parquet(hist_root).drop("batch")
    return cur.unionByName(hist)
