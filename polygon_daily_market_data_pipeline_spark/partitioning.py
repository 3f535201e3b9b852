"""Partitioning helpers: compute-spread for expression-heavy stages.

A parquet scan sizes its splits for IO (``spark.sql.files.maxPartitionBytes``),
not CPU. A small or single-row-group file therefore lands on ONE core even
on a 32-core executor — and a stage whose per-row cost is large (md5
shingling, MinHash signatures, LSH projections, vector math) then runs at
1/32 of machine throughput. ``spread_for_compute`` hash-repartitions on the
row key up to cluster parallelism so such stages scale with cores.

Cost model: the repartition shuffles the input once. For the operators that
use it the downstream work (explode + shuffle on shingle/band/bucket keys,
or O(|Q|·|C|) vector kernels) dominates that one pass by orders of
magnitude. On a well-partitioned 100 TB input (partitions ≥ cores) callers
pass ``spread=False`` (or the helper's guard makes it a no-op when the
plan already has enough row-bearing partitions — we cannot observe
row-bearing-ness cheaply, so the guard is parallelism-based).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def spread_for_compute(
    df: DataFrame, key: Column | str, min_parts: int | None = None
) -> DataFrame:
    """Hash-repartition ``df`` on ``key`` to at least cluster parallelism.

    Deterministic (hash of the key, not round-robin) so downstream
    results never depend on input arrival order."""
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    return df.repartition(target, F.col(key) if isinstance(key, str) else key)
