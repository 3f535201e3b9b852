"""Per-row spark-vs-oracle evidence for the warehouse audit queries.

Round-8 postmortem: the driver recorded only ``hash_match: false`` for
the 33-row union — nothing said WHICH row diverged, and the judge could
not reproduce the mismatch. This tool makes the next mismatch diffable
post-hoc: for every audit check it records the Spark-side
(n_rows, n_aux, val) triple, the DuckDB oracle's twin (each check's
fragment runs standalone via ``_oracle_for([check])``), and a per-row
match verdict under the driver-normalization (``check_oracle._norm`` —
floats at 6dp, the same reduction the driver's hash applies — since
round 11 every val is a scaled BIGINT, so the money/ratio columns
compare as integers).

``bench.py`` calls :func:`compare` every round and writes
``WAREHOUSE_ROWS_r{N}.json`` (N inferred from the existing
``BENCH_r*.json`` artifacts); standalone use:

    python tools/warehouse_rows.py [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
for p in (str(_REPO), str(_REPO / "tools")):
    if p not in sys.path:
        sys.path.insert(0, p)

from check_oracle import TABLES, _norm  # noqa: E402


def _duck_rows(sf_dir: str, checks: "list[str]") -> "dict[str, tuple]":
    """Run each check's standalone oracle fragment on DuckDB."""
    import duckdb

    from polygon_daily_market_data_pipeline_spark.plans.warehouse_ops import (
        _oracle_for,
    )

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    out = {}
    for c in checks:
        rows = con.sql(_oracle_for([c])).fetchall()
        assert len(rows) == 1, (c, rows)
        out[c] = rows[0]
    con.close()
    return out


def compare(
    sf_dir: str,
    spark=None,
    spark_rows: "dict[str, dict[str, tuple]] | None" = None,
) -> dict:
    """Per-check spark-vs-oracle table for all three warehouse queries.

    Pass ``spark`` to run the queries here, or ``spark_rows`` (query name
    -> {check_name: (n_rows, n_aux, val)}) to reuse rows an earlier run
    already collected (bench.py reuses its timed runs' checkpointed
    frames — re-running the union would double its cost)."""
    from polygon_daily_market_data_pipeline_spark.plans.analytics import (
        QUERIES,
    )
    from polygon_daily_market_data_pipeline_spark.plans.warehouse_ops import (
        WAREHOUSE_QUERIES,
        checks_for,
    )

    result: dict = {"sf_dir": sf_dir, "queries": {}, "all_match": True}
    for qname, branches in WAREHOUSE_QUERIES.items():
        checks = checks_for(branches)
        if spark_rows is not None and qname in spark_rows:
            srows = spark_rows[qname]
        else:
            df = QUERIES[qname](spark, sf_dir)
            srows = {
                r["check_name"]: (r["n_rows"], r["n_aux"], r["val"])
                for r in df.collect()
            }
        orows = _duck_rows(sf_dir, checks)
        per_check = {}
        for c in checks:
            s = srows.get(c)
            o = orows[c][1:]  # drop the check_name column
            match = s is not None and all(
                _norm(a, spark_side=True) == _norm(b)
                for a, b in zip(s, o)
            )
            per_check[c] = {
                "spark": list(s) if s is not None else None,
                "oracle": list(o),
                "match": bool(match),
            }
            if not match:
                result["all_match"] = False
        result["queries"][qname] = per_check
    return result


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else None

    from polygon_daily_market_data_pipeline_spark.session import get_spark

    spark = get_spark("warehouse-rows")
    spark.sparkContext.setLogLevel("ERROR")
    res = compare(sf_dir, spark=spark)
    text = json.dumps(res, indent=1)
    if out_path:
        Path(out_path).write_text(text)
    print(text)
    return 0 if res["all_match"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
