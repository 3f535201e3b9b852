"""Range (interval) join — point-in-interval alignment.

``l.ts BETWEEN r.start AND r.end`` as a plain join condition gives
Spark a broadcast-nested-loop plan: O(|L|·|R|) comparisons. The
scalable formulation bins the time axis:

1. pick a bin width ≥ the typical interval length;
2. point side: one row per (bin(ts));
   interval side: one row per bin the interval overlaps
   (``sequence(bin(start), bin(end))`` exploded — intervals spanning k
   bins replicate k×, which is why the bin should cover the common
   interval);
3. equi-join on (keys…, bin) — hash join, shuffled, AQE-skew-splittable;
4. re-check the exact BETWEEN predicate.

Cost: |L| + Σ⌈len/bin⌉ rows through one hash join instead of a
pairwise loop. The classic trick behind every production range joiner
(including Databricks' range-join hints).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    by: list[str] | None = None,
    bin_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row containing it
    (inclusive bounds), equi-keyed on ``by`` + time bin."""
    by = by or []
    p_bin = (F.col(point_col).cast("long") / bin_seconds).cast("long")
    p = points.withColumn("_bin", p_bin)
    i = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                (F.col(start_col).cast("long") / bin_seconds).cast("long"),
                (F.col(end_col).cast("long") / bin_seconds).cast("long"),
            )
        ),
    )
    joined = p.join(i, [*by, "_bin"], how).where(
        F.col(point_col).between(F.col(start_col), F.col(end_col))
    )
    return joined.drop("_bin")
