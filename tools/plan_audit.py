"""Physical-plan audit over the registered query suite.

For every ``queries()`` entry, builds the DataFrame at the given SF and
extracts the plan-quality signals the scale design cares about (counts
of exchanges / broadcast joins / sort-merge joins / nested-loop joins /
Python eval nodes, and whether scans carry pushed filters), then writes
a markdown table to PLANS.md. Regenerate with:

    python tools/plan_audit.py [sf_dir] [out_md]

Counting is a WALK OF THE JVM PLAN TREE, not a regex over
``explain()`` text, because the string form multi-counts at every level
once caches and AQE are involved: each occurrence of an
``InMemoryTableScan`` reprints the cached relation's full miss-recovery
lineage, and every nested ``AdaptiveSparkPlan`` prints BOTH its final
and initial plans (the round-6 diff showed `neardup_jaccard_pairs` at
"202 exchanges" by regex when the executed work has 9). The walk counts
what an action actually runs:

- each cached relation's build plan is descended into ONCE per query
  (a second ``InMemoryTableScan`` of the same relation reads the block
  manager, so repeats contribute only the scan);
- ``AdaptiveSparkPlan`` contributes its current (final, if executed)
  plan only — never the superseded initial plan;
- ``ReusedExchange`` is a pointer to an exchange counted at its first
  site, so it neither counts nor descends;
- query-stage wrappers are transparent;
- expression-held subquery plans (scalar subqueries, IN-subqueries,
  DPP filters — ``QueryPlan.subqueries``) are walked like children:
  their exchanges/joins execute too, and a children-only walk would
  undercount them (``ReusedSubqueryExec`` is skipped, same rule as
  ``ReusedExchange``).

The two ``*_stream`` queries are excluded: their builders RUN the
stream to a memory sink, so the returned frame's plan is a memory scan,
not the streaming plan (those are audited in tests/test_streaming.py).
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

SKIP = {"events_hourly_stream", "events_sessionize_stream"}

# JVM SparkPlan simple class name -> signal bucket
NODE_SIGNALS = {
    "ShuffleExchangeExec": "exchanges",
    "BroadcastHashJoinExec": "broadcast_joins",
    "SortMergeJoinExec": "sortmerge_joins",
    "BroadcastNestedLoopJoinExec": "nested_loop",
    "CartesianProductExec": "nested_loop",
    "ArrowEvalPythonExec": "python_eval",
    "BatchEvalPythonExec": "python_eval",
    "MapInPandasExec": "python_eval",
    "FlatMapGroupsInPandasExec": "python_eval",
    "FlatMapCoGroupsInPandasExec": "python_eval",
    "FlatMapGroupsInPandasWithStateExec": "python_eval",
}
SIGNAL_COLS = [
    "exchanges",
    "broadcast_joins",
    "sortmerge_joins",
    "nested_loop",
    "python_eval",
]


def _children(node) -> list:
    seq = node.children()
    return [seq.apply(i) for i in range(seq.size())]


def _subquery_plans(node) -> list:
    """Physical plans held INSIDE the node's expressions (scalar
    subqueries, IN-subqueries, DPP filters) — executed by the node but
    invisible to children(), so a children-only walk undercounts their
    exchanges/joins. ``QueryPlan.subqueries`` collects each
    ``PlanExpression``'s plan (``BaseSubqueryExec`` wrappers, whose own
    children are the real subquery plans)."""
    seq = node.subqueries()
    return [seq.apply(i) for i in range(seq.size())]


def count_signals(jvm, root) -> dict[str, int]:
    """Walk a JVM SparkPlan, tallying NODE_SIGNALS for the work one
    action executes (see module docstring for the cache/AQE/reuse
    rules). Expression-held subquery plans are walked too;
    ``ReusedSubqueryExec`` points at a subquery counted at its first
    site, so — like ``ReusedExchange`` — it neither counts nor
    descends."""
    counts = dict.fromkeys(SIGNAL_COLS, 0)
    seen_caches: set[int] = set()
    stack = [root]
    while stack:
        node = stack.pop()
        name = node.getClass().getSimpleName()
        if name in ("ReusedExchangeExec", "ReusedSubqueryExec"):
            continue
        if name == "AdaptiveSparkPlanExec":
            stack.append(node.executedPlan())
            continue
        if name.endswith("QueryStageExec"):
            # AQE stage wrappers (shuffle/broadcast/table-cache/result)
            # hold their plan out-of-band, not in children()
            stack.append(node.plan())
            continue
        if name == "InMemoryTableScanExec":
            rel = node.relation()
            key = jvm.System.identityHashCode(rel.cacheBuilder())
            if key not in seen_caches:
                seen_caches.add(key)
                stack.append(rel.cachedPlan())
            continue
        sig = NODE_SIGNALS.get(name)
        if sig is not None:
            counts[sig] += 1
        stack.extend(_children(node))
        stack.extend(_subquery_plans(node))
    return counts


def audit(sf_dir: str) -> list[dict]:
    import os

    # round 15: __spark_entry__.queries() wraps every entry with the
    # eval census (eager localCheckpoint + collect + local oracle) —
    # exactly what a PLAN audit must not see (a checkpoint scan audits
    # as a blank plan). Opt out; the census belongs to driver-style
    # evaluations, not plan inspection.
    os.environ["SPARK_GRAFT_CENSUS"] = "0"
    import __spark_entry__ as ent
    from polygon_daily_market_data_pipeline_spark.session import get_spark

    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    jvm = spark.sparkContext._jvm
    rows = []
    scratch = []
    for name, fn in ent.queries().items():
        if name in SKIP:
            continue
        if name.startswith("warehouse_"):
            # the registered queries return eagerly-checkpointed frames
            # (scratch cleanup + TZ restore), whose plan is a checkpoint
            # scan; audit the LAZY union instead — the real per-branch
            # plans (same frame the checkpoint materializes)
            import tempfile

            from polygon_daily_market_data_pipeline_spark.plans.warehouse_ops import (
                WAREHOUSE_QUERIES,
                build_maintenance_union,
            )

            base = tempfile.mkdtemp(prefix="plan_audit_whm_")
            scratch.append(base)
            df = build_maintenance_union(
                spark, sf_dir, base, branches=WAREHOUSE_QUERIES[name]
            ).orderBy("check_name")
        elif name == "embedding_ann_ivf":
            # round 11: the registered query checkpoints its three audit
            # rows inside worker threads (co-scheduled audits); audit the
            # LAZY union so the real encode/join plans stay inspectable
            from polygon_daily_market_data_pipeline_spark.plans.llm_ops import (
                embedding_ann_ivf,
            )

            df = embedding_ann_ivf(spark, sf_dir, eager=False)
        else:
            df = fn(spark, sf_dir)
        qe = df._jdf.queryExecution()
        row = {"query": name, **count_signals(jvm, qe.executedPlan())}
        # pushed-filter evidence still comes from the scan's string form
        plan = qe.executedPlan().toString()
        row["pushed_filters"] = "yes" if "PushedFilters: [" in plan and not re.search(
            r"PushedFilters: \[\]", plan
        ) else ("n/a" if "PushedFilters" not in plan else "none")
        rows.append(row)
    import shutil

    for base in scratch:
        shutil.rmtree(base, ignore_errors=True)
    return rows


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = Path(sys.argv[2]) if len(sys.argv) > 2 else _REPO / "PLANS.md"
    rows = audit(sf_dir)
    cols = ["query", *SIGNAL_COLS, "pushed_filters"]
    lines = [
        "# PLANS — physical-plan audit of the registered suite",
        "",
        f"Generated by `python tools/plan_audit.py {sf_dir}`. Counts come",
        "from a walk of the JVM plan tree that mirrors what one action",
        "executes: each cached relation's build is counted once per query",
        "(later scans of the same relation read the block manager),",
        "`AdaptiveSparkPlan` contributes only its current plan, and",
        "`ReusedExchange`/`ReusedSubquery` neither count nor descend — a",
        "regex over the explain string would multi-count all three.",
        "Expression-held subquery plans (scalar subqueries, DPP filters)",
        "are walked like children. Plans audited before",
        "AQE finalization are upper bounds (AQE may still convert",
        "sort-merge joins to broadcast and coalesce exchanges at runtime).",
        "The invariants pinned in",
        "`tests/test_plans.py` (zero nested-loop joins suite-wide, required",
        "broadcasts, WindowGroupLimit, partition pruning) are the hard",
        "gates; this table is the per-query evidence.",
        "",
        "| " + " | ".join(cols) + " |",
        "|" + "|".join("---" for _ in cols) + "|",
    ]
    for r in rows:
        lines.append("| " + " | ".join(str(r[c]) for c in cols) + " |")
    nl = sum(r["nested_loop"] for r in rows)
    nl_q = sorted(r["query"] for r in rows if r["nested_loop"])
    lines += [
        "",
        f"Suite totals: {sum(r['exchanges'] for r in rows)} exchanges, "
        f"{sum(r['broadcast_joins'] for r in rows)} broadcast joins, "
        f"{sum(r['sortmerge_joins'] for r in rows)} sort-merge joins, "
        f"**{nl} nested-loop/cartesian joins** across "
        f"{len(rows)} audited queries.",
        "",
        f"The nested-loop occurrences ({', '.join(nl_q)}) are the"
        " intentional 1-row-aggregate audit cross joins (reference J4/A4"
        " semantics) whitelisted by"
        " `test_no_accidental_cartesian_or_nested_loop_anywhere`; the"
        " brute-force kNN baseline has no join at all — its |Q|×|C|"
        " expansion happens inside the broadcast-matrix BLAS matmul"
        " (counted under python_eval).",
    ]
    out.write_text("\n".join(lines) + "\n")
    print(f"wrote {out} ({len(rows)} queries, {nl} nested-loop joins)")


if __name__ == "__main__":
    main()
