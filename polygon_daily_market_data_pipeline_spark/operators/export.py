"""Training-shard export: the hand-off from Spark to a training loader.

Loaders want (a) shards of a predictable row count, (b) a global
shuffle that is REPRODUCIBLE per seed (epoch N must be re-creatable),
(c) a line-oriented format. ``rand()`` breaks (b) under retries and
repartitioning; the deterministic shuffle key is the same md5 trick as
sampling: ``md5(seed || key)`` gives a uniform, engine-independent
total order, ``repartitionByRange`` on it makes shard ASSIGNMENT
deterministic, and ``sortWithinPartitions`` makes shard CONTENT ORDER
deterministic — byte-identical output for a given (data, seed, shards).

Cost: one range-partitioning shuffle (with a sampling pass for range
boundaries) — the price of determinism; at 100 TB it is the same
shuffle an ORDER BY would pay.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shuffled_shards(
    df: DataFrame,
    key: str,
    rows_per_shard: int,
    seed: int = 0,
) -> DataFrame:
    """Deterministically shuffled frame, range-partitioned into
    ⌈n/rows_per_shard⌉ shards (one output file each on write)."""
    n = df.count()
    shards = max(1, math.ceil(n / rows_per_shard))
    h = F.md5(F.concat(F.lit(str(seed)), F.lit(":"), F.col(key).cast("string")))
    return (
        df.withColumn("_shuffle", h)
        .repartitionByRange(shards, "_shuffle")
        .sortWithinPartitions("_shuffle")
        .drop("_shuffle")
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    key: str,
    rows_per_shard: int = 10_000,
    seed: int = 0,
    fmt: str = "json",
) -> int:
    """Write shuffled shards (JSONL by default); returns shard count."""
    out = shuffled_shards(df, key, rows_per_shard, seed)
    out.write.mode("overwrite").format(fmt).save(path)
    return out.rdd.getNumPartitions()


def pack_sequences(
    chunks: DataFrame,
    target_tokens: int,
    id_col: str = "chunk_id",
    text_col: str = "chunk_text",
    tokens_col: str = "n_tokens",
    seed: int = 0,
) -> DataFrame:
    """Greedy sequence packing: concatenate chunks into training rows
    of ≤ ``target_tokens`` (a chunk longer than the budget gets a row
    of its own — packers truncate downstream, we never drop). Output:
    (seq_id string, text string, n_tokens long, n_chunks int).

    The packing itself is inherently sequential, so it runs per
    PARTITION (mapInPandas): chunks are first deterministically
    shuffled and range-partitioned by the same md5(seed||id) key as
    ``shuffled_shards`` — so (a) the mix within each packed sequence is
    random-but-reproducible per seed, (b) partitions pack
    independently, no coordination, and (c) the only waste is one
    partial bin per partition (negligible: bins-per-partition ≫ 1 at
    any real scale). seq_id = partition id + local bin index —
    deterministic for a given (data, seed, partitioning)."""
    key = F.md5(F.concat(F.lit(str(seed) + ":"), F.col(id_col).cast("string")))
    arranged = (
        chunks.select(
            F.col(id_col), F.col(text_col), F.col(tokens_col), key.alias("__k")
        )
        .repartitionByRange(chunks.sparkSession.sparkContext.defaultParallelism, "__k")
        .sortWithinPartitions("__k")
    )

    def pack(batches):
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        bins = []  # (texts, tokens)
        cur_t, cur_n, cur_texts = 0, 0, []
        for pdf in batches:
            for r in pdf.itertuples(index=False):
                t = int(getattr(r, tokens_col))
                if cur_texts and cur_t + t > target_tokens:
                    bins.append((cur_texts, cur_t, cur_n))
                    cur_t, cur_n, cur_texts = 0, 0, []
                cur_texts.append(str(getattr(r, text_col)))
                cur_t += t
                cur_n += 1
        if cur_texts:
            bins.append((cur_texts, cur_t, cur_n))
        yield pd.DataFrame(
            {
                "seq_id": [f"p{pid:05d}-b{i:06d}" for i in range(len(bins))],
                "text": ["\n\n".join(texts) for texts, _t, _n in bins],
                "n_tokens": [t for _x, t, _n in bins],
                "n_chunks": [n for _x, _t, n in bins],
            }
        )

    return arranged.mapInPandas(
        pack, "seq_id string, text string, n_tokens long, n_chunks int"
    )
