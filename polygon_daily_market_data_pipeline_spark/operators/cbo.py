"""Stats-driven join planning (VERDICT r11 #2): the engine's own
cost-based broadcast / build-side decision, fed by the versioned-table
manifest log and the ANALYZE sidecar instead of Catalyst's static frame
heuristics.

The reference delegates join planning wholly to Snowflake's optimizer
(SURVEY.md §4.1 — "join reordering … delegated"); Spark's static
equivalent keys off ``sizeInBytes`` propagated through the logical
plan. For OUR versioned tables that estimate is opaque and lossy:
``read_version`` frames are unions of file scans behind deletion-vector
anti-joins, equality-delete filters, and column-mapping coalesces, so
Catalyst sees propagated byte guesses — stored bytes that still count
dv-deleted rows, heuristic post-join sizes — not the table's visible
state. The manifest + sidecar know that state exactly:

- visible ROW count: ``fast_count`` (footer rows minus dv
  cardinalities) — metadata only;
- on-disk BYTES: the manifest's data directories walked driver-side —
  file-count-sized work, no Spark job;
- join-key NDV: the ANALYZE sidecar's KMV estimate → a skew ratio
  (rows per distinct key) that warns before the shuffle, not after.

``plan_join_with_stats`` makes the call and ENFORCES it with join
hints (``broadcast`` / ``merge``), which take precedence over the
static size heuristics; AQE may still improve a shuffle join at
runtime with true sizes — desirable, and never the reverse
(a hinted broadcast of a stats-proven-small side cannot be demoted).
Skewed keys are flagged from the sidecar so the caller can salt
(``operators.salting``) or lean on AQE skew-join before launching a
100 TB shuffle.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from polygon_daily_market_data_pipeline_spark.operators.versioned import (
    _load_manifest,
    _manifests,
    _stats_path,
    fast_count,
    histogram_bounds,
    kmv_estimate,
    prune_files,
    read_version,
    scan_version,
    scan_version_with_stats,
)

# Defaults mirror spark.sql.autoBroadcastJoinThreshold's 10 MB.
BROADCAST_BYTES_DEFAULT = 10 * 1024 * 1024
SKEW_RATIO_DEFAULT = 32.0


def table_size_estimate(
    table_dir: str, version: "int | None" = None
) -> dict:
    """Metadata-only size of a versioned table's visible state:
    ``{"rows", "bytes", "files"}``. ``rows`` is ``fast_count`` (None
    when unprovable — e.g. pending equality deletes); ``bytes``/
    ``files`` walk the manifest's data directories driver-side (the
    stored footprint — an upper bound on visible bytes when row-level
    deletes are pending). Zero Spark jobs at any table size."""
    from polygon_daily_market_data_pipeline_spark.operators.layout import (
        list_parquet_files,
    )

    versions = _manifests(table_dir)
    if not versions:
        raise FileNotFoundError(f"no versions in {table_dir}")
    v = versions[-1] if version is None else version
    m = _load_manifest(table_dir, v)
    # ONE directory walk yields both bytes and rows (fast_count's exact
    # semantics inlined — a second walk per planning call would double
    # the driver-side listing cost at millions of files): rows go None
    # on a pending equality-delete list or any file without recorded
    # footer rows; dv cardinalities subtract.
    stats = m.get("files") or {}
    n_bytes, n_files = 0, 0
    rows: "int | None" = None if m.get("eqdel") else 0
    for d in m["dirs"]:
        dir_path = d if os.path.isabs(d) else os.path.join(table_dir, d)
        for f in list_parquet_files(dir_path):
            n_bytes += os.path.getsize(f)
            n_files += 1
            if rows is not None:
                ent = stats.get(os.path.relpath(f, table_dir))
                rows = None if ent is None else rows + ent["rows"]
    if rows is not None:
        for ent in (m.get("dv") or {}).values():
            rows -= ent["n"]
    return {"rows": rows, "bytes": n_bytes, "files": n_files}


def _numeric_bound(v) -> bool:
    """True when ``v`` can soundly parameterize a NUMERIC histogram —
    the sidecar only records histograms for numeric columns, so a
    string/date/datetime bound is the caller-side type-mismatch class
    the tolerance contract covers (skip refinement, keep files whole).
    ``None`` is an unbounded side and always fine. NaN and bool are
    rejected (ADVICE r15): NaN comparisons would yield an arbitrary
    refinement instead of the skip the tolerance contract intends, and
    a bool bound is a type mismatch that merely happens to subclass
    int."""
    import decimal
    import math
    import numbers

    if v is None:
        return True
    if isinstance(v, bool) or not isinstance(
        v, (numbers.Real, decimal.Decimal)
    ):
        return False
    try:
        return not math.isnan(float(v))
    except (ValueError, OverflowError):
        # a Decimal too large for float is numeric and non-NaN; the
        # histogram-bounds arithmetic below handles it via float(inf)
        # semantics no worse than the envelope path — keep files whole
        # by skipping refinement (the safe direction)
        return False


def filtered_size_bound(
    table_dir: str,
    predicates: dict,
    version: "int | None" = None,
) -> dict:
    """PROVABLE upper bound on a versioned table's size under a
    conjunctive range predicate ``{col: (lo, hi)}``, from the
    manifest's per-file envelopes alone: ``{"rows_ub", "bytes_ub",
    "files", "files_total"}``. The bound is the file-granular one the
    envelopes can prove — pruned files provably contain NO matching
    row, every kept file is counted WHOLE (rows from footer counts,
    bytes from the filesystem). Selectivity inside a kept file is
    never guessed: an interpolated estimate could justify broadcasting
    a side that turns out 100× larger, and this planner's contract is
    that a broadcast decision is backed by proof, not a histogram bet.
    When an ANALYZE sidecar exists at exactly this version, the
    predicate columns' exact-count histograms REFINE ``rows_ub`` to
    row granularity (``histogram_bounds`` — straddling buckets counted
    whole, so still proof); ``rows_ub_source`` records which bound won.

    Pending deletion vectors / equality deletes do NOT void the bound
    (they only hide rows — the true filtered count can only be lower),
    so unlike ``fast_count`` this stays provable mid-MERGE; ``rows_ub``
    is None only when a kept file has no recorded footer row count
    (legacy commit without stats). Zero Spark jobs at any table size:
    one manifest read + one directory walk, same cost shape as
    ``table_size_estimate``."""
    versions = _manifests(table_dir)
    if not versions:
        raise FileNotFoundError(f"no versions in {table_dir}")
    v = versions[-1] if version is None else version
    m = _load_manifest(table_dir, v)
    kept, total = prune_files(table_dir, m, predicates)
    stats = m.get("files") or {}
    rows: "int | None" = 0
    n_bytes = 0
    for f in kept:
        n_bytes += os.path.getsize(f)
        if rows is not None:
            ent = stats.get(os.path.relpath(f, table_dir))
            rows = None if ent is None else rows + ent["rows"]
    # Row-granular refinement (round 13): when an ANALYZE sidecar
    # exists AT this exact version, each predicate column's histogram
    # yields an exact upper bound on matching rows (histogram_bounds —
    # still proof, not interpolation: straddling buckets are counted
    # whole). The conjunction is bounded by its tightest single-column
    # bound; it can only tighten the file-granular count, and it stays
    # available even when a kept file lacks footer rows (rows None).
    hist_ub: "int | None" = None
    for col, rng in predicates.items():
        lo, hi = rng if isinstance(rng, (tuple, list)) else (rng, rng)
        # tolerance contract (ADVICE r13): prune_files keeps the file
        # and never crashes on bound/stat type mismatches — a string or
        # datetime bound on a numeric histogrammed column must skip the
        # refinement for that column, not raise from float(lo).
        # ADVICE r14: the tolerance is a TYPE check on the caller's
        # bound, not a blanket except — a malformed STORED histogram
        # (sidecar corruption) now raises instead of silently dropping
        # the refinement.
        if _numeric_bound(lo) and _numeric_bound(hi):
            hb = histogram_bounds(table_dir, col, lo, hi, version=v)
        else:
            hb = None
        if hb is not None:
            hist_ub = hb[1] if hist_ub is None else min(hist_ub, hb[1])
    rows_ub = rows
    source = "files"
    if hist_ub is not None and (rows is None or hist_ub < rows):
        rows_ub = hist_ub
        source = "histogram"
    return {
        "rows_ub": rows_ub,
        "bytes_ub": n_bytes,
        "files": len(kept),
        "files_total": total,
        "rows_ub_source": source,
    }


def _sidecar_ndv_at(
    table_dir: str, col: str, version: "int | None"
) -> "tuple[int, int] | None":
    """(ndv_estimate, analyzed_version) from the newest ANALYZE sidecar
    at or before ``version``, or None when the column was never
    analyzed. Pure metadata read."""
    versions = _manifests(table_dir)
    if not versions:
        raise FileNotFoundError(f"no versions in {table_dir}")
    v = versions[-1] if version is None else version
    analyzed = [
        pv for pv in versions if pv <= v and os.path.exists(_stats_path(table_dir, pv))
    ]
    if not analyzed:
        return None
    av = analyzed[-1]
    with open(_stats_path(table_dir, av)) as f:
        stats = json.load(f)
    st = stats["columns"].get(col)
    if st is None:
        return None
    kmv_set = st["kmv_set"]
    ndv_k = len(kmv_set)
    return (
        kmv_estimate(ndv_k, kmv_set[-1] if kmv_set else None, stats["k"]),
        av,
    )


def sidecar_ndv(
    table_dir: str, col: str, version: "int | None" = None
) -> "int | None":
    """The column's NDV estimate from the newest ANALYZE sidecar at or
    before ``version`` (the KMV estimator — exact below k), or None
    when the column was never analyzed. Pure metadata read."""
    res = _sidecar_ndv_at(table_dir, col, version)
    return None if res is None else res[0]


def key_skew_ratio(
    table_dir: str, col: str, version: "int | None" = None
) -> "float | None":
    """rows-per-distinct-key of ``col`` from metadata alone — the
    pre-shuffle skew signal (a join/groupBy key with ratio ≫ 1 means
    few reducers own most rows). None when rows or NDV are unprovable.

    Rows and NDV are taken at the SAME version — the newest ANALYZEd
    one at or before ``version`` — so the ratio is a real statistic of
    one table state: dividing today's row count by last month's NDV
    would flag a uniform key as skewed after a large append (and
    keeping statistics fresh is ``analyze_incremental``'s cheap job,
    not this function's guess)."""
    res = _sidecar_ndv_at(table_dir, col, version)
    if res is None:
        return None
    ndv, analyzed_version = res
    rows = fast_count(table_dir, version=analyzed_version)
    if rows is None or not ndv:
        return None
    return rows / ndv


def key_uniqueness(
    table_dir: str, col: str, version: "int | None" = None
) -> "bool | None":
    """Metadata PROOF of column uniqueness at the newest analyzed
    version: True when the sidecar's NDV is EXACT (distinct count below
    the KMV sketch size) and equals the exact visible row count — the
    FK→PK certificate that makes an N:1 join provably row-preserving
    on the fact side; False when exact NDV < exact rows (duplicates
    proven); None when either side is unprovable (estimate-only NDV,
    rows unknowable under pending equality deletes, never analyzed).
    Cannot-prove never asserts — same posture as every stats surface
    here. Pure metadata read.

    The proof holds only AT the analyzed version: any commit after it
    could have introduced duplicates, so a request for a LATER version
    returns None — a certificate must never outlive the state it was
    proven on (re-ANALYZE at the version being joined to renew it)."""
    versions = _manifests(table_dir)
    if not versions:
        raise FileNotFoundError(f"no versions in {table_dir}")
    v = versions[-1] if version is None else version
    analyzed = [
        pv for pv in versions
        if pv <= v and os.path.exists(_stats_path(table_dir, pv))
    ]
    if not analyzed:
        return None
    av = analyzed[-1]
    if av != v:
        return None  # stale proof: commits landed after the ANALYZE
    with open(_stats_path(table_dir, av)) as f:
        stats = json.load(f)
    st = stats["columns"].get(col)
    if st is None:
        return None
    ndv_k = len(st["kmv_set"])
    if ndv_k >= stats["k"]:
        return None  # NDV is an estimate past the sketch — no proof
    rows = fast_count(table_dir, version=av)
    if rows is None:
        return None
    # NULL keys never match an equi-join, so N:1 safety needs only the
    # NON-NULL values to be unique: exact distinct == non-null rows
    non_null = rows - int(st.get("nulls") or 0)
    return ndv_k == non_null


def plan_join_with_stats(
    spark: SparkSession,
    fact: DataFrame,
    dim_dir: str,
    on,
    *,
    how: str = "inner",
    broadcast_threshold_bytes: int = BROADCAST_BYTES_DEFAULT,
    broadcast_threshold_rows: "int | None" = None,
    fact_dir: "str | None" = None,
    skew_ratio_threshold: float = SKEW_RATIO_DEFAULT,
    dim_version: "int | None" = None,
    auto_salt: bool = False,
    n_salts: int = 8,
    dim_predicates: "dict | None" = None,
) -> "tuple[DataFrame, dict]":
    """Join ``fact`` with the versioned table at ``dim_dir``, choosing
    broadcast-vs-shuffle from the dim's MANIFEST/SIDECAR statistics and
    enforcing the choice with a join hint. Returns ``(joined,
    decision)`` where ``decision`` records what was read and chosen::

        {"strategy": "broadcast" | "merge",
         "dim_rows": int | None, "dim_bytes": int, "dim_files": int,
         "skew_key": str | None, "skew_ratio": float | None,
         "skewed": bool}

    Broadcast fires when the dim's metadata proves it small: visible
    rows known (``fast_count``) and either ``rows <=
    broadcast_threshold_rows`` (when given — the SF-stable form) or
    ``bytes <= broadcast_threshold_bytes``. Unprovable rows (pending
    equality deletes) never broadcast — cannot-prove takes the safe
    shuffle plan.

    ``fact_dir`` (an analyzed versioned table holding the fact side)
    adds the skew signal: ``key_skew_ratio`` of the first join key —
    rows per distinct key from the sidecar's KMV NDV. ``skewed=True``
    is advisory by default: the join is still planned (AQE skew-join
    splits oversized partitions at runtime); callers owning the
    shuffle can pre-salt via ``operators.skew``. The stats are
    METADATA-ONLY reads — planning schedules zero Spark jobs beyond
    the join itself.

    ``auto_salt=True`` closes the skew loop (round 13, VERDICT r12
    #2): when the sidecar flags the key as skewed AND the chosen plan
    is a shuffle join AND the keys are plain column names, the join is
    rewritten as ``operators.skew.salted_join`` — the dim replicated
    ``n_salts``× and each hot fact key fanned out over ``n_salts``
    reducers, so no single reducer owns a hot key's full row mass.
    Result rows are identical to the un-salted join (the salt is an
    extra equi-key both sides construct consistently, dropped on
    return). A broadcast join never salts — there is no shuffle to
    skew. ``decision["salted"]`` records whether the rewrite fired.
    The dim-side replication cost is n_salts × dim_bytes of extra
    shuffle write — that is the affordability the caller accepts by
    opting in, and only for a dim already past the broadcast
    threshold, i.e. exactly the moderate-dim / hot-fact-key shape
    where one straggling reducer otherwise dominates the stage.

    ``dim_predicates`` (``{col: (lo, hi)}``, round 13) makes the plan
    FILTER-AWARE: the join is priced on the dim AS FILTERED — sized by
    ``filtered_size_bound``'s provable envelope upper bound and read
    through ``scan_version`` (pruned files + residual filter, so the
    joined rows are exactly ``fact ⋈ (dim WHERE pred)``). A selective
    predicate on a big dim is the canonical case Catalyst's static
    sizing misses here: the unfiltered table says shuffle, while the
    bound proves the filtered side fits under the broadcast threshold.
    Because the bound counts kept files WHOLE, a broadcast it fires is
    still proof-backed — never an interpolation bet.

    The dim VERSION is resolved ONCE up front: the decision and the
    read must see the same table state, or a concurrent append landing
    between them could get a stats-proven-small broadcast enforced on
    an arbitrarily larger new version."""
    if dim_version is None:
        versions = _manifests(dim_dir)
        if not versions:
            raise FileNotFoundError(f"no versions in {dim_dir}")
        dim_version = versions[-1]
    if dim_predicates is not None:
        bound = filtered_size_bound(
            dim_dir, dim_predicates, version=dim_version
        )
        est = {
            "rows": bound["rows_ub"],
            "bytes": bound["bytes_ub"],
            "files": bound["files"],
        }
    else:
        est = table_size_estimate(dim_dir, version=dim_version)
    if broadcast_threshold_rows is not None:
        small = (
            est["rows"] is not None
            and est["rows"] <= broadcast_threshold_rows
        )
    else:
        small = (
            est["rows"] is not None
            and est["bytes"] <= broadcast_threshold_bytes
        )
    keys = on if isinstance(on, (list, tuple)) else [on]
    skew_key = keys[0] if isinstance(keys[0], str) else None
    ratio = (
        key_skew_ratio(fact_dir, skew_key)
        if (fact_dir is not None and skew_key is not None)
        else None
    )
    if dim_predicates is not None:
        dim = scan_version(spark, dim_dir, dim_predicates, version=dim_version)
    else:
        dim = read_version(spark, dim_dir, version=dim_version)
    skewed = bool(ratio is not None and ratio >= skew_ratio_threshold)
    salted = False
    if small:
        joined = fact.join(F.broadcast(dim), on, how)
        strategy = "broadcast"
    else:
        strategy = "merge"
        str_keys = [k for k in keys if isinstance(k, str)]
        # salting replicates the DIM side, which is only sound for
        # join types whose dim-row multiplicity flows through matches
        # (inner/left/semi/anti) — a right/full outer would emit each
        # unmatched dim row n_salts times (salted_join refuses too)
        saltable_how = how.lower().replace("_", "") in (
            "inner", "left", "leftouter", "leftsemi", "leftanti",
            "semi", "anti",
        )
        if auto_salt and skewed and saltable_how and len(str_keys) == len(keys):
            from polygon_daily_market_data_pipeline_spark.operators.skew import (
                salted_join,
            )

            # hint the dim subtree so the salted join stays a SHUFFLE
            # join even if Catalyst's static estimate would broadcast
            # the replicated dim (a broadcast would make the salt dead
            # weight — correct, but not the plan the flag asked for)
            joined = salted_join(
                fact, dim.hint("merge"), str_keys, n_salts=n_salts, how=how
            )
            salted = True
        else:
            joined = fact.join(dim.hint("merge"), on, how)
    decision = {
        "strategy": strategy,
        "dim_rows": est["rows"],
        "dim_bytes": est["bytes"],
        "dim_files": est["files"],
        "skew_key": skew_key,
        "skew_ratio": ratio,
        "skewed": skewed,
        "salted": salted,
        "n_salts": n_salts if salted else None,
        "filtered": dim_predicates is not None,
        # FK→PK certificate: True = the dim key is PROVABLY unique at
        # this version (an inner/left join moves no fact rows), False =
        # duplicates proven (the join MULTIPLIES — audit before
        # shipping), None = no proof either way
        "dim_key_unique": (
            key_uniqueness(dim_dir, skew_key, version=dim_version)
            if skew_key is not None
            else None
        ),
    }
    return joined, decision


def plan_star_join(
    spark: SparkSession,
    fact: DataFrame,
    dims: "list[tuple[str, object]]",
    *,
    how: str = "inner",
    broadcast_threshold_bytes: int = BROADCAST_BYTES_DEFAULT,
    broadcast_threshold_rows: "int | None" = None,
    fact_dir: "str | None" = None,
    skew_ratio_threshold: float = SKEW_RATIO_DEFAULT,
    auto_salt: bool = False,
    n_salts: int = 8,
    dim_predicates: "list[dict | None] | None" = None,
) -> "tuple[DataFrame, dict]":
    """Multi-way star join ordered by the tables' OWN statistics
    (round 13, VERDICT r12 #1): join ``fact`` against every versioned
    dim in ``dims`` (``[(dim_dir, on), ...]``), choosing the JOIN ORDER
    from manifest/sidecar sizes instead of taking the authoring order —
    the reference's delegated-to-Snowflake capability (SURVEY.md §4.1
    "join reordering … delegated") that Catalyst cannot supply here
    because the versioned frames hide true sizes behind
    dv-anti-join/colmap subplans and Spark never reorders a
    user-written join chain anyway.

    Ordering policy, stats-proven and deterministic:

    - every dim's size is resolved METADATA-ONLY at a pinned version
      (``table_size_estimate`` — rows when ``broadcast_threshold_rows``
      is given, bytes otherwise; zero Spark jobs);
    - broadcast-eligible dims join FIRST, ascending by size: each is a
      map-side hash join with no shuffle barrier, so all of them run
      inside the scan stage before the first exchange;
    - above-threshold dims join LAST, ascending by size, as hinted
      shuffle joins — every merge join reshuffles the accumulated
      intermediate, so the widest table enters the pipeline as late as
      possible;
    - if ANY dim's size metric is unprovable (rows unknown under
      pending equality deletes in rows mode), the WHOLE ordering falls
      back to authoring order — a partially-proven reorder could
      demote a truly-small dim behind an unprovable giant, and
      cannot-prove never plans worse than what the author wrote. Each
      dim still gets its own stats-proven broadcast/merge hint (the
      per-join decision needs only that dim's own stats).

    Each per-dim join is planned by ``plan_join_with_stats`` — same
    thresholds, same version pinning, same ``auto_salt`` escape for
    sidecar-flagged skew. ``dim_predicates`` (round 13, parallel to
    ``dims``) makes individual dims FILTER-AWARE: a dim with a
    predicate is sized by ``filtered_size_bound``'s provable envelope
    upper bound and read pre-filtered through ``scan_version`` — so a
    big-but-selectively-filtered dim can order (and broadcast) as the
    small side it provably is. Returns ``(joined, decision)`` with
    ``decision = {"order": [input indices in join order], "provable":
    bool, "dims": [per-dim plan_join_with_stats decisions, in JOIN
    order]}``."""
    if dim_predicates is None:
        dim_predicates = [None] * len(dims)
    if len(dim_predicates) != len(dims):
        raise ValueError(
            f"dim_predicates has {len(dim_predicates)} entries for "
            f"{len(dims)} dims"
        )
    sizes: "list[int | None]" = []
    versions: "list[int]" = []
    for (dim_dir, _on), pred in zip(dims, dim_predicates):
        vs = _manifests(dim_dir)
        if not vs:
            raise FileNotFoundError(f"no versions in {dim_dir}")
        versions.append(vs[-1])
        if pred is not None:
            bound = filtered_size_bound(dim_dir, pred, version=vs[-1])
            est = {"rows": bound["rows_ub"], "bytes": bound["bytes_ub"]}
        else:
            est = table_size_estimate(dim_dir, version=vs[-1])
        sizes.append(
            est["rows"] if broadcast_threshold_rows is not None
            else est["bytes"]
        )
    provable = all(s is not None for s in sizes)
    if provable:
        if broadcast_threshold_rows is not None:
            small = [s <= broadcast_threshold_rows for s in sizes]
        else:
            small = [s <= broadcast_threshold_bytes for s in sizes]
        # broadcasts first (ascending size), then shuffles (ascending);
        # index tiebreak keeps equal-size order deterministic = authored
        order = sorted(
            range(len(dims)), key=lambda i: (not small[i], sizes[i], i)
        )
    else:
        order = list(range(len(dims)))
    joined = fact
    dim_decisions = []
    for i in order:
        dim_dir, on = dims[i]
        joined, d = plan_join_with_stats(
            spark,
            joined,
            dim_dir,
            on,
            how=how,
            broadcast_threshold_bytes=broadcast_threshold_bytes,
            broadcast_threshold_rows=broadcast_threshold_rows,
            fact_dir=fact_dir,
            skew_ratio_threshold=skew_ratio_threshold,
            dim_version=versions[i],
            auto_salt=auto_salt,
            n_salts=n_salts,
            dim_predicates=dim_predicates[i],
        )
        dim_decisions.append(d)
    return joined, {
        "order": order,
        "provable": provable,
        "dims": dim_decisions,
    }


def dynamic_file_prune_join(
    spark: SparkSession,
    fact_dir: str,
    dim: DataFrame,
    fact_key: str,
    dim_key: "str | None" = None,
    *,
    how: str = "inner",
    max_keys: int = 10_000,
    fact_version: "int | None" = None,
    predicates: "dict | None" = None,
) -> "tuple[DataFrame, dict]":
    """Join-time dynamic file pruning — the runtime-filter / DPP analog
    done at the MANIFEST level (round 13): collect the small side's
    distinct join keys, prune the versioned FACT's file list with an
    IN-list envelope+bloom prune (``scan_version(in_filter=...)``),
    broadcast the dim, and join. Files whose key envelope cannot
    contain any dim key are never scheduled at all — at 100 TB a
    date-clustered fact joined to a dim holding three dates reads
    three commits' files, not the table. Spark's own DPP only prunes
    HIVE-partition directories of a catalog table and its runtime
    bloom filters still schedule every file; this prune happens before
    task scheduling, against the same per-file stats the commit
    already recorded.

    The key collect is ONE dim-sized Spark job bounded by
    ``max_keys`` (+1 probe row): if the dim has more distinct keys,
    pruning is SKIPPED — a fallback plain broadcast join over the full
    fact (decision records it) — because shipping an unbounded key
    list to the driver is exactly the collect this engine bans. NULL
    dim keys are dropped from the prune list (an equi-join never
    matches NULL), and since the prune only drops fact files, only
    join types where an unmatched FACT row is droppable are accepted:
    ``inner`` / ``semi`` / ``right`` (unmatched dim rows survive a
    right join from the dim side, which is read whole). ``left``/
    ``full`` outer would need the pruned-away fact rows back — refused.
    Inner/semi joins broadcast the dim; a right-outer CANNOT build on
    its right side (Spark would silently drop the hint), so that plan
    is left to Catalyst/AQE — the file prune, this operator's point,
    already happened on the fact scan either way.

    ``predicates`` forwards an ordinary range predicate to the same
    scan, so static envelope pruning and the dynamic key prune compose
    in one file walk. Returns ``(joined, decision)`` with ``decision =
    {"pruned": bool, "n_keys": int | None, "files_scheduled": int,
    "files_total": int}``."""
    dim_key = dim_key or fact_key
    how_norm = how.lower().replace("_", "")
    if how_norm not in ("inner", "semi", "leftsemi", "right", "rightouter"):
        raise ValueError(
            f"how={how!r}: dynamic file pruning drops fact files, which "
            "is only sound for inner/semi/right joins — a left/full "
            "outer needs the unmatched fact rows the prune removed"
        )
    key_rows = (
        dim.select(dim_key).where(F.col(dim_key).isNotNull())
        .distinct().limit(max_keys + 1).collect()
    )
    keys = [r[0] for r in key_rows]
    if len(keys) > max_keys:
        fact = (
            scan_version(
                spark, fact_dir, predicates or {}, version=fact_version
            )
            if predicates
            else read_version(spark, fact_dir, version=fact_version)
        )
        n_files = len(fact.inputFiles())
        decision = {
            "pruned": False,
            "n_keys": None,
            "files_scheduled": n_files,
            "files_total": n_files,
        }
    else:
        fact, stats = scan_version_with_stats(
            spark,
            fact_dir,
            predicates or {},
            version=fact_version,
            in_filter={fact_key: keys},
        )
        decision = {
            "pruned": True,
            "n_keys": len(keys),
            "files_scheduled": stats.files_scheduled,
            "files_total": stats.files_total,
        }
    if how_norm in ("semi", "leftsemi"):
        dsel = dim.select(dim_key).distinct()
        joined = fact.join(
            F.broadcast(dsel),
            fact_key if dim_key == fact_key
            else fact[fact_key] == dsel[dim_key],
            "left_semi",
        )
    elif how_norm in ("right", "rightouter"):
        # a right-outer join cannot build on its right side, so a
        # broadcast hint on the dim would be silently dropped; leave
        # the plan to Catalyst/AQE — the file prune (the point of this
        # operator) already happened on the fact scan
        joined = (
            fact.join(dim, fact_key, how)
            if dim_key == fact_key
            else fact.join(dim, fact[fact_key] == dim[dim_key], how)
        )
    elif dim_key == fact_key:
        joined = fact.join(F.broadcast(dim), fact_key, how)
    else:
        joined = fact.join(
            F.broadcast(dim), fact[fact_key] == dim[dim_key], how
        )
    return joined, decision


def physical_plan(df: DataFrame) -> str:
    """The formatted physical plan string (pre-execution: under AQE
    this is the initial plan the static decision produced — what the
    hint enforcement is asserted against)."""
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)
