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


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or list(OPS)

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
