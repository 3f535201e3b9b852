"""Connected components — the clustering step of near-dup dedup.

Pairwise dedup (Jaccard/MinHash/SimHash/embedding) yields EDGES; what a
corpus pipeline actually deletes is per-CLUSTER: group transitively
connected docs, keep one canonical per component. This is iterative
min-label propagation (the simplified Hash-Min / "small-star" scheme):

    label(v) ← min(label(v), min over neighbors u of label(u))

repeated until fixpoint — O(component diameter) rounds, each one join +
one aggregation shuffled on node id. Near-dup graphs are overwhelmingly
tiny cliques, so 2-3 rounds close almost all corpora. Each round
``localCheckpoint``s the label frame: iterative plans otherwise grow
lineage exponentially and re-execute every prior round per action.

The driver-side convergence check (one scalar count per round) is the
legitimate driver role in iterative algorithms — labels themselves
never leave the executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    component = min node id reachable. Deterministic."""
    # undirected: symmetrize once
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # The label graph is bounded by the DUPLICATED docs, typically ≪ the
    # corpus: size the per-round shuffles to the measured edge count
    # (~50k edges per partition) instead of the session default, so a
    # small graph iterates at small-job cost while a huge one keeps full
    # parallelism. One count on the checkpointed edges pays for it.
    sc = edges.sparkSession.sparkContext
    n_parts = max(1, min(sc.defaultParallelism, e.count() // 50_000 + 1))
    e = e.repartition(n_parts, "b")
    labels = (
        e.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .repartition(n_parts, "node")
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # candidate label for each node: the min of its neighbors' labels
        neighbor_min = (
            e.join(labels, e.b == labels.node)
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("component").alias("nbr_min"))
        )
        # the per-node change flag rides the update projection (round
        # 16): new < old ⟺ a non-null neighbor min beat the label —
        # exactly the rows the former post-hoc updated⋈labels
        # inequality join found, now a column on the checkpointed
        # frame, so the convergence probe is a narrow limit-1 scan of
        # materialized blocks instead of a join + shuffle per round
        updated = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("nbr_min", F.col("component"))
                ).alias("component"),
                (
                    F.coalesce("nbr_min", F.col("component"))
                    < F.col("component")
                ).alias("chg"),
            )
            .localCheckpoint(eager=True)
        )
        changed = updated.where("chg").limit(1).count()
        labels = updated.drop("chg")
        if changed == 0:
            break
    return labels


def neardup_components(
    pairs: DataFrame, release_pairs: bool = False
) -> DataFrame:
    """Near-dup pair frame (doc_a, doc_b, …) → (doc_id, cluster_id,
    is_canonical): the keep/drop decision per document.

    ``release_pairs=True`` unpersists the (typically cached) pair frame
    once the component computation no longer needs it — safe because
    ``connected_components`` eagerly checkpoints the symmetrized edge
    frame up front, so every later action reads the checkpoint, never
    the pair plan. Terminal consumers (the registered cluster query)
    use this so a dedup run leaves no per-call caches behind."""
    cc = connected_components(pairs, src="doc_a", dst="doc_b")
    if release_pairs:
        pairs.unpersist()
        for f in getattr(pairs, "_cached_inputs", ()):
            f.unpersist()
    return cc.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        (F.col("node") == F.col("component")).alias("is_canonical"),
    )
