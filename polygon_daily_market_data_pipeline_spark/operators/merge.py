"""Keyed MERGE operators (SURVEY.md §2.3 J5/J6, §4.3.1).

OSS Spark SQL has no ``MERGE INTO`` on plain parquet, so these are
library operators built from join algebra — semantics exactly match the
reference's Snowflake MERGEs:

- ``merge_upsert``      = ``MERGE ... WHEN MATCHED THEN UPDATE WHEN NOT
  MATCHED THEN INSERT`` (``/root/reference/dags/sql/merge_core.sql:5-33``,
  ``merge_facts_daily.sql:5-38``). Implemented as a full-outer join +
  column-wise ``coalesce`` (source wins on match).
- ``insert_only_merge`` = ``MERGE ... WHEN NOT MATCHED THEN INSERT`` with
  no update branch (``merge_dim_security.sql:12-14``,
  ``merge_dim_date.sql:22-32``). Implemented as left-anti + union.
- ``assign_surrogate_keys`` = the implied IDENTITY column
  (SECURITY_ID inserted without a value in ``merge_dim_security.sql:13-14``).
  Deterministic: ``max(existing) + dense rank of new keys``, unlike
  ``monotonically_increasing_id`` which is partition-layout dependent.

Scale notes: the upsert's full-outer join shuffles both sides on the
merge key — unavoidable for a general upsert. In the daily-pipeline
path the source is a single date partition, so the caller should
partition the target by ``trade_date`` and merge only that partition
(partition pruning turns the 100 TB target scan into one day's worth).
The insert-only merge broadcasts nothing by default but dims are small;
Catalyst/AQE auto-broadcasts the anti-join build side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    update_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Upsert ``source`` into ``target`` on ``keys``.

    Matched rows take the source's ``update_cols`` (default: every
    non-key column); unmatched target rows carry over; unmatched source
    rows insert. The caller is responsible for source-side dedup
    (the reference always QUALIFY-dedups before MERGE —
    merge_core.sql:13-16 — so MERGE never sees duplicate source keys).

    Returns a DataFrame with the target's schema.
    """
    non_key = [c for c in target.columns if c not in keys]
    update_cols = list(update_cols) if update_cols is not None else non_key

    src = source.select(
        # Explicit presence marker: the join is null-safe on the keys, so a
        # legitimately-NULL source key can match a NULL-keyed target row —
        # inferring presence from key nullability would misclassify that
        # row as unmatched and silently keep stale target values.
        F.lit(True).alias("__src_present"),
        *[F.col(k).alias(f"__src_{k}") for k in keys],
        *[F.col(c).alias(f"__src_{c}") for c in non_key],
    )
    cond = [target[k].eqNullSafe(F.col(f"__src_{k}")) for k in keys]
    joined = target.join(src, cond, "full_outer")

    out_cols: list[Column] = []
    for k in keys:
        out_cols.append(
            F.when(F.col("__src_present").isNotNull(), F.col(f"__src_{k}"))
            .otherwise(target[k])
            .alias(k)
        )
    matched = F.col("__src_present").isNotNull()
    for c in non_key:
        if c in update_cols:
            # matched → source value; source-only → source value;
            # target-only → target value.
            out_cols.append(
                F.when(matched, F.col(f"__src_{c}")).otherwise(target[c]).alias(c)
            )
        else:
            out_cols.append(F.coalesce(target[c], F.col(f"__src_{c}")).alias(c))
    return joined.select(*out_cols)


def insert_only_merge(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """Append source rows whose key is absent from target; never update.

    ≡ ``dim ∪ (src ∖ dim)`` — the reference's grow-only dimension merge.
    Source is deduped on the key first (distinct), mirroring the
    ``SELECT DISTINCT`` feeding both dim merges
    (merge_dim_security.sql:7-9, merge_dim_date.sql:7-19).
    """
    new_rows = source.select(*target.columns).dropDuplicates(list(keys)).join(
        target.select(*keys), list(keys), "left_anti"
    )
    return target.unionByName(new_rows)


def assign_surrogate_keys(
    new_rows: DataFrame,
    key_col: str,
    id_col: str,
    existing_max: int = 0,
) -> DataFrame:
    """Deterministic surrogate-key assignment for dimension inserts.

    ``id = existing_max + row_number() over (order by key)`` — stable
    across reruns and partition layouts (SURVEY.md §4.3.5), unlike
    ``monotonically_increasing_id``. The window is un-partitioned, which
    serializes — acceptable because dim *inserts* per batch are small
    (new symbols per day ≪ total rows); never use on fact-sized data.
    """
    w = Window.orderBy(F.col(key_col))
    return new_rows.withColumn(
        id_col, (F.lit(existing_max) + F.row_number().over(w)).cast("long")
    )
