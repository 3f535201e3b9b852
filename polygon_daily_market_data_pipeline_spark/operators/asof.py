"""As-of join — "most recent prior observation" alignment.

The reference's domain (market data) is where this operator lives:
align each event of one series with the latest not-later row of another
(trades↔quotes, orders↔reference prices). The reference itself has no
as-of join (SURVEY.md §2.3 note); it is added here as a
training/analytics extension, verified against DuckDB's native
``ASOF JOIN``.

Spark has no as-of join either; a naive theta-join
(``l.ts >= r.ts`` + top-1) is a broadcast-nested-loop disaster at any
scale. The scalable formulation is the union-merge:

1. tag both sides, union them into one frame;
2. one shuffle on the ``by`` key, one sort on (ts, side) per key;
3. forward-fill the right side's payload with
   ``last(payload, ignorenulls=True)`` over an unbounded-preceding
   window — each left row picks up the latest right row at-or-before it
   (right sorts before left on ties ⇒ inclusive semantics, matching
   DuckDB's ``l.ts >= r.ts``);
4. keep the left rows.

Cost: exactly one shuffle + sort of |L|+|R| — the same shape as a
sort-merge join, with no pairwise expansion, no skew beyond the key
distribution itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: list[str] | None = None,
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For every left row: the latest right row with
    ``right.on <= left.on`` (within the same ``by`` group). Right-side
    payload columns come back as ``<col><suffix>`` (NULL when no prior
    right row exists — left semantics, like pandas ``merge_asof``)."""
    by = by or []
    value_cols = value_cols or [
        c for c in right.columns if c != on and c not in by
    ]
    l_tag = left.select(
        *by,
        F.col(on).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}") for c in value_cols],
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
    )
    r_tag = right.select(
        *by,
        F.col(on).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
        F.lit(None).cast(
            l_tag.schema["_l"].dataType
        ).alias("_l"),
    )
    merged = l_tag.unionByName(r_tag)
    part_cols = [F.col(c) for c in by] or [F.lit(0)]
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(F.col("_t").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = merged.select(
        "_side",
        "_l",
        *[
            F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
    out_cols = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    return filled.where(F.col("_side") == 1).select(
        *out_cols, *[f"{c}{suffix}" for c in value_cols]
    )
