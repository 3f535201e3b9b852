"""Skew mitigation operators.

AQE's skew-join splitting (on in ``session.py``) handles most runtime
skew; these are the explicit tools for the cases AQE can't see:

- ``salted_join``: a shuffle join where one side's key distribution is
  pathological (a handful of keys own most rows). The small side is
  replicated ``n_salts``× with an explicit salt column; the big side
  derives a deterministic per-row salt, so each hot key fans out over
  ``n_salts`` reducers instead of melting one. Deterministic (hash
  salt, not ``rand()``) — replayable results, stable tests.
- ``two_phase_distinct_count``: COUNT(DISTINCT x) per low-cardinality
  group. A direct distinct-aggregate cannot fully combine map-side, so
  every (group, x) pair shuffles to #groups reducers; the two-phase
  form dedups on (group, x) first — map-side combinable, key space
  #groups × |x| — then counts, so no reducer ever sees more than its
  hash share. The classic web-scale "unique users per segment" shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``keys`` with the hot side fanned out
    over ``n_salts`` reducers per key.

    ``small`` is replicated n_salts× (explode) — use only when
    |small|·n_salts is shuffle-affordable; ``big`` gets a deterministic
    row salt from hashing its full row, so duplicates of a hot key
    spread evenly.

    Join types preserving the replicated side's multiplicity only
    through MATCHES are supported: inner, left outer, left semi, left
    anti (each big row carries exactly one salt, so its match set and
    outer/semi/anti fate are unchanged). right/full outer are REFUSED:
    an unmatched small row exists n_salts times and would emit
    n_salts null-padded rows instead of one."""
    h = how.lower().replace("_", "")
    if h not in ("inner", "left", "leftouter", "leftsemi", "leftanti", "semi", "anti"):
        raise ValueError(
            f"salted_join does not support how={how!r}: the replicated "
            "side's unmatched rows would multiply"
        )
    salt_values = F.array(*[F.lit(i) for i in range(n_salts)])
    small_rep = small.withColumn("_salt", F.explode(salt_values))
    big_salted = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts)).cast("int")
    )
    out = big_salted.join(small_rep, keys + ["_salt"], how)
    return out.drop("_salt")


def two_phase_distinct_count(
    df: DataFrame,
    group_cols: list[str],
    distinct_col: str,
    out_col: str = "n_distinct",
) -> DataFrame:
    """COUNT(DISTINCT distinct_col) GROUP BY group_cols, in two
    map-side-combinable phases: dedup on (group, value), then count per
    group. Same result as the direct distinct aggregate; bounded-reducer
    shuffle shape."""
    return (
        df.select(*group_cols, distinct_col)
        .dropDuplicates([*group_cols, distinct_col])
        .groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias(out_col))
    )
