"""Chaos harness for the warehouse trio (VERDICT r9 #8): the one
environment axis none of the green evaluations exercised is DRIVER-LIKE
LOAD — the three queries running CONCURRENTLY in one session, next to
unrelated Spark actions, CPU/GC pressure, and a non-UTC session default.

Why those axes: the registered queries pin-and-restore SHARED session
conf while they run (`_run_union` pins the session TZ; the streaming
branches pin `spark.sql.shuffle.partitions` to 8) — under concurrency
one query's restore can land mid-flight in another's build. A
shuffle-partition flip changes double-sum partial-aggregation order
(retired as a value hazard by round 10's exact decimal sums, but the
harness would have caught it); a TZ flip would shift the `_CUT`
timestamp literal and move real row counts. Serial re-runs — judge x5,
bench, pytest — can never see either.

Every evaluation flows through the same `_run_union` path the driver
uses, so each one also lands in WAREHOUSE_EVAL_LOG.jsonl; this script
additionally diffs every collected row against the standalone DuckDB
oracle fragment and NAMES any divergent check.

Usage:
    python tools/chaos_eval.py [sf_dir] [iterations]
    python tools/chaos_eval.py --driver-seq [sf_dir] [passes]

``--driver-seq`` (round 11, VERDICT r10 #7) reproduces the DRIVER'S OWN
evaluation shape instead of the adversarial-concurrency one: the full
registered suite, in driver order, differentially checked against
DuckDB, run ``passes`` times (default 2) in ONE session with the CPU/GC
pressure on — the driver's red rounds interleaved the warehouse queries
with the other 48 in exactly this sequence. Every warehouse evaluation
flows through `_run_union`, so each also lands in the eval log WITH its
locally-run oracle half (WAREHOUSE_ORACLE_EVAL stays on), and the tail
of the run prints the per-query fingerprint census across passes — a
sequence-position-dependent divergence names itself twice: once in the
differential, once in the log.

Exit 0 = every evaluation row-exact under load; 1 = divergence (named).
"""

from __future__ import annotations

import os
import sys
import threading
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
for p in (str(_REPO), str(_REPO / "tools")):
    if p not in sys.path:
        sys.path.insert(0, p)

from check_oracle import _norm  # noqa: E402
from warehouse_rows import _duck_rows  # noqa: E402


def _burn(q):
    """CPU/GC pressure loop (module-level: spawn must pickle it)."""
    import numpy as np

    rng = np.random.default_rng(0)
    a = rng.random((400, 400))
    garbage = []
    while q.empty():
        a = a @ a % 1.7  # keep values bounded
        garbage.append(bytearray(1 << 18))
        if len(garbage) > 64:
            garbage.clear()


def _cpu_load(stop, n_procs: int = 4):
    """Background CPU/GC pressure in separate PROCESSES (the GIL would
    defang thread-based load): numpy matmuls + allocation churn."""
    import multiprocessing as mp

    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    procs = [
        ctx.Process(target=_burn, args=(q,), daemon=True)
        for _ in range(n_procs)
    ]
    for p in procs:
        p.start()
    stop.append((q, procs))


def driver_seq(sf_dir: str, passes: int = 2) -> int:
    """The full suite in driver order, ``passes``× in one session under
    CPU load, differentially checked pass by pass (check_oracle's exact
    compare), then the warehouse fingerprint census across passes."""
    import duckdb

    from check_oracle import TABLES, run_suite
    from polygon_daily_market_data_pipeline_spark.session import get_spark

    spark = get_spark("chaos-driver-seq")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    stop: list = []
    _cpu_load(stop)
    total_checked, all_failures = 0, []
    try:
        for n in range(passes):
            t0 = time.monotonic()
            checked, failures = run_suite(
                spark, con, sf_dir, label=f"p{n} "
            )
            dt = time.monotonic() - t0
            total_checked += checked
            all_failures += [f"pass {n}: {f}" for f in failures]
            print(
                f"pass {n}: {checked - len(failures)}/{checked} ok "
                f"in {dt:.0f}s"
            )
    finally:
        for q, procs in stop:
            q.put(1)
            for p in procs:
                p.terminate()
    # fingerprint census: every warehouse evaluation this process logged
    # must agree with itself across passes AND with its own oracle half
    from polygon_daily_market_data_pipeline_spark.plans.warehouse_ops import (
        WAREHOUSE_QUERIES,
    )

    import eval_log_diff as eld

    log = Path(
        os.environ.get("WAREHOUSE_EVAL_LOG")
        or (_REPO / "WAREHOUSE_EVAL_LOG.jsonl")
    )
    pid = os.getpid()
    for qname in WAREHOUSE_QUERIES:
        recs = [
            r
            for r in eld.load(log, qname, sf_dir)
            if r.get("pid") == pid
        ]
        fps = {r["fingerprint"] for r in recs}
        omatch = {r.get("oracle_match") for r in recs if "oracle_match" in r}
        print(
            f"census {qname}: {len(recs)} evals, fingerprints={sorted(fps)}, "
            f"oracle_match={sorted(str(x) for x in omatch)}"
        )
        if len(fps) > 1 or omatch - {True}:
            all_failures.append(f"census {qname}: {sorted(fps)} {omatch}")
    print(
        f"\n{total_checked - len(all_failures)}/{total_checked} clean "
        f"under the driver sequence; {len(all_failures)} divergences"
    )
    return 1 if all_failures else 0


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--driver-seq":
        sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
        return driver_seq(sf, int(sys.argv[3]) if len(sys.argv) > 3 else 2)
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    from polygon_daily_market_data_pipeline_spark.plans.analytics import (
        QUERIES,
    )
    from polygon_daily_market_data_pipeline_spark.plans.warehouse_ops import (
        WAREHOUSE_QUERIES,
        checks_for,
    )
    from polygon_daily_market_data_pipeline_spark.session import get_spark

    spark = get_spark("chaos-eval")
    spark.sparkContext.setLogLevel("ERROR")

    all_checks = [c for b in WAREHOUSE_QUERIES.values() for c in checks_for(b)]
    expected = _duck_rows(sf_dir, all_checks)

    stop: list = []
    _cpu_load(stop)
    failures: list[str] = []
    clean = 0

    noise_queries = ["pricing_summary", "rolling_7d_volume", "revenue_by_nation"]

    def run_query(qname: str, results: dict):
        try:
            df = QUERIES[qname](spark, sf_dir)
            results[qname] = {
                r["check_name"]: (r["n_rows"], r["n_aux"], r["val"])
                for r in df.collect()
            }
        except Exception as e:  # noqa: BLE001
            results[qname] = e

    def run_noise(qname: str):
        try:
            QUERIES[qname](spark, sf_dir).collect()
        except Exception:  # noqa: BLE001, S110
            pass

    try:
        for it in range(iters):
            # a driver-like session default that is NOT what the queries
            # need: a TZ pin/restore race now shifts _CUT and shows up
            # as a named value mismatch instead of a mystery hash
            spark.conf.set("spark.sql.session.timeZone", "America/New_York")
            results: dict = {}
            threads = [
                threading.Thread(target=run_query, args=(q, results))
                for q in WAREHOUSE_QUERIES
            ] + [threading.Thread(target=run_noise, args=(q,)) for q in noise_queries]
            t0 = time.monotonic()
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            dt = time.monotonic() - t0
            iter_bad = []
            for qname, branches in WAREHOUSE_QUERIES.items():
                got = results.get(qname)
                if isinstance(got, Exception):
                    iter_bad.append(f"{qname}: raised {got!r}")
                    continue
                for c in checks_for(branches):
                    want = expected[c][1:]
                    have = got.get(c)
                    if have is None:
                        iter_bad.append(f"{qname}/{c}: ROW MISSING")
                    elif [
                        _norm(v, spark_side=True) for v in have
                    ] != [_norm(v) for v in want]:
                        iter_bad.append(
                            f"{qname}/{c}: spark={have} oracle={tuple(want)}"
                        )
            if iter_bad:
                failures.extend(f"iter {it}: {m}" for m in iter_bad)
                print(f"iter {it}: DIVERGED ({len(iter_bad)}) in {dt:.1f}s")
                for m in iter_bad:
                    print("   ", m)
            else:
                clean += len(WAREHOUSE_QUERIES)
                print(f"iter {it}: clean ({dt:.1f}s, {clean} evals total)")
    finally:
        for q, procs in stop:
            q.put(1)
            for p in procs:
                p.terminate()
    print(
        f"\n{clean} clean evaluations under load; {len(failures)} divergences"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
