"""Embedding similarity search: brute-force cosine top-k (exact
baseline) and random-hyperplane LSH bucketing (the scale path).

Vector math is Catalyst-native (``zip_with`` + ``aggregate`` over
``array<float>`` promoted to double) — no UDF, so the kernel lives in
whole-stage codegen. At very high dims/ks a vectorized Pandas-UDF
(BLAS) kernel wins; that variant is ``cosine_topk_pandas`` below,
Arrow-batched, for when profiling says so.

Scale design:
- brute force is O(|Q|·|C|): correct tool for small query sets / reranking;
  the corpus side stays partitioned, queries broadcast.
- LSH buckets: h deterministic hyperplanes → 2^h buckets; candidates
  share a bucket (multi-probe: optionally neighbors at Hamming-1).
  Shuffle is on bucket id; per-bucket work is |bucket|², controlled by h.
- IVF-style variant: cluster centroids (kmeans off-line), probe top-c
  centroids — same join shape; left as the natural extension.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query (excluding self).

    Output: (query_id, neighbor_id, rank, cos). Queries are broadcast
    (small side by contract); the corpus never moves. Rank ties break
    on neighbor_id — fully deterministic."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("q_vec"), F.col("c_vec")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (pure-python LCG so
    results are reproducible across numpy versions)."""
    state = seed & 0x7FFFFFFF or 1
    planes: list[list[float]] = []
    for _ in range(n_planes):
        v = []
        for _ in range(dim):
            # Park–Miller minimal standard LCG
            state = (state * 48271) % 2147483647
            u1 = state / 2147483647
            state = (state * 48271) % 2147483647
            u2 = state / 2147483647
            # Box–Muller for gaussian components
            v.append(
                math.sqrt(-2.0 * math.log(max(u1, 1e-12)))
                * math.cos(2 * math.pi * u2)
            )
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / n for x in v])
    return planes


def with_lsh_buckets(
    df: DataFrame,
    vec_col: str,
    n_planes: int,
    n_tables: int,
    seed: int,
    dim: int,
) -> DataFrame:
    """Multi-table random-hyperplane LSH: one (table_id, bucket) pair per
    table, exploded to rows. Per-table bucket = sign pattern of
    ``n_planes`` projections; a pair collides in a table with
    probability (1 − θ/π)^n_planes, and OR-amplification across
    ``n_tables`` tables lifts recall to 1 − (1 − p^b)^L."""
    entries = []
    for t in range(n_tables):
        planes = hyperplanes(dim, n_planes, seed + 1000 * t)
        bucket = F.lit(0)
        for p, plane in enumerate(planes):
            proj = dot(F.col(vec_col), F.array(*[F.lit(x) for x in plane]))
            bucket = bucket + F.when(proj >= 0, F.lit(2**p)).otherwise(F.lit(0))
        entries.append(
            F.struct(F.lit(t).alias("table_id"), bucket.cast("int").alias("bucket"))
        )
    return df.withColumn("lsh", F.explode(F.array(*entries))).select(
        *df.columns, "lsh.table_id", "lsh.bucket"
    )


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 3,
    n_tables: int = 12,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates = union over L hash tables of
    same-bucket pairs (OR-amplified hyperplane LSH), then exact cosine
    rerank of candidates only.

    Same output schema as the brute force; recall asserted in tests.
    The candidate join shuffles on (table_id, bucket) instead of
    cross-joining — at 100 TB this is the difference between
    O(|Q|·|C|) and O(L · Σ_b |Q_b|·|C_b|). Tune (n_planes, n_tables)
    for the recall/cost point; defaults give ~0.9 recall at cos≈0.4
    neighbor similarity."""
    dim = len(corpus.select(vec_col).first()[0])
    cb = with_lsh_buckets(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")),
        "c_vec", n_planes, n_tables, seed, dim,
    )
    qb = with_lsh_buckets(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")),
        "q_vec", n_planes, n_tables, seed, dim,
    )
    cands = (
        cb.join(qb, ["table_id", "bucket"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "q_vec", "neighbor_id", "c_vec")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cands.select(
        "query_id",
        "neighbor_id",
        cosine(F.col("q_vec"), F.col("c_vec")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def cosine_topk_pandas(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Vectorized (Arrow/numpy) brute-force variant: queries collected
    to a matrix, corpus streamed per partition through mapInPandas with
    one BLAS matmul per batch. Use when dim·k make the codegen kernel
    the bottleneck; semantics identical to cosine_topk_bruteforce
    except scores are float64 numpy (same rounding class)."""
    import numpy as np
    import pandas as pd

    q_rows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([r[0] for r in q_rows])
    q_mat = np.array([r[1] for r in q_rows], dtype=np.float64)
    q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True)

    spark = corpus.sparkSession
    b_ids = spark.sparkContext.broadcast(q_ids)
    b_mat = spark.sparkContext.broadcast(q_mat)

    def score(batches):
        for pdf in batches:
            c_mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            c_mat /= np.linalg.norm(c_mat, axis=1, keepdims=True)
            sims = c_mat @ b_mat.value.T  # |batch| × |Q|
            n_ids = pdf[id_col].to_numpy()
            out = pd.DataFrame(
                {
                    "query_id": np.repeat(b_ids.value, len(n_ids)),
                    "neighbor_id": np.tile(n_ids, len(b_ids.value)),
                    "cos": sims.T.ravel(),
                }
            )
            yield out[out.query_id != out.neighbor_id]

    scored = corpus.select(id_col, vec_col).mapInPandas(
        score, "query_id long, neighbor_id long, cos double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )
