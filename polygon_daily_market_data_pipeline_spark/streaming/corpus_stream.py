"""Incremental corpus ingestion with near-dup rejection.

The batch dedup operators answer "which existing docs are dups"; a
live training-data pipeline needs the incremental form: documents
arrive continuously and each new document must be admitted or rejected
against EVERYTHING already admitted. MinHash makes this scale: the
admitted corpus is represented by its (doc_id, band_idx, band_key)
index — a few dozen bytes per doc instead of its text — and a new
micro-batch only joins against the bands it collides with.

``foreachBatch`` pipeline per micro-batch:

1. compute the batch's shingles + band keys (linear, batch-sized);
2. LSH-join batch bands against the admitted band index (shuffle is on
   band_key, touching only colliding index rows);
3. exact-Jaccard verify candidates (batch side re-shingled; index side
   shingles re-read from the admitted store only for candidate docs —
   candidate-bounded IO);
4. batch-internal dedup (same LSH among the batch's own rows, keeping
   min doc_id);
5. append survivors to the admitted store and their bands to the index.

Replays are idempotent at the store level: the checkpoint makes batch
ids stable and admitted appends are keyed by doc_id (re-admittance of
an already-indexed doc_id is dropped in step 2's exact-id check).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from polygon_daily_market_data_pipeline_spark.operators.text_dedup import (
    DEFAULT_BAND_ROWS,
    DEFAULT_NUM_HASHES,
    _jaccard_from_inter,
    _with_shingles,
    minhash_signature_cols,
)

BANDS_SCHEMA = "doc_id long, band_idx int, band_key string"
DOCS_SCHEMA_DDL = "doc_id long, text string"


def band_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = DEFAULT_NUM_HASHES,
    band_rows: int = DEFAULT_BAND_ROWS,
) -> DataFrame:
    """(doc_id, band_idx, band_key) rows — the compact dedup index."""
    sh = _with_shingles(df, id_col, text_col, 3, persist=False)
    sigs = sh.select(
        "doc_id", *minhash_signature_cols(F.col("shingles"), num_hashes)
    )
    n_bands = num_hashes // band_rows
    return sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.md5(
                            F.concat_ws(
                                "|",
                                *[
                                    F.col(f"mh_{b * band_rows + r}")
                                    for r in range(band_rows)
                                ],
                            )
                        ).alias("band_key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "band.band_idx", "band.band_key")


class CorpusDedupSink:
    """State for the incremental dedup: admitted docs + band index, both
    parquet dirs. Call ``process(batch_df)`` per micro-batch (wired via
    foreachBatch) or directly for batch backfills.

    ``eval_grams`` (optional) composes benchmark DECONTAMINATION into
    the same micro-batch pipeline: a distinct n-gram frame from
    ``operators.decontam.eval_ngram_set`` — docs sharing any gram with
    it are rejected alongside the near-dups, so leaked eval content
    never enters the admitted store OR the band index. The eval set is
    benchmark-sized (MBs); it broadcasts inside the per-batch
    semi-join, adding no corpus-sized work."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        threshold: float = 0.5,
        eval_grams: DataFrame | None = None,
        decontam_n: int = 8,
    ):
        self.spark = spark
        self.root = root
        self.threshold = threshold
        self.eval_grams = eval_grams
        self.decontam_n = decontam_n
        self.docs_path = os.path.join(root, "admitted_docs")
        self.bands_path = os.path.join(root, "band_index")

    def _read(self, path: str, ddl: str) -> DataFrame:
        if os.path.exists(path):
            return self.spark.read.schema(ddl).parquet(path)
        return self.spark.createDataFrame([], ddl)

    def admitted(self) -> DataFrame:
        return self._read(self.docs_path, DOCS_SCHEMA_DDL)

    def process(self, batch: DataFrame, batch_id: int = 0) -> None:
        batch = batch.select("doc_id", "text").localCheckpoint(eager=True)
        index = self._read(self.bands_path, BANDS_SCHEMA)
        admitted = self.admitted()

        new_bands = band_index(batch).localCheckpoint(eager=True)

        # --- candidates vs the admitted corpus (and exact-id replays) ---
        cand_ids = (
            new_bands.alias("n")
            .join(index.alias("i"), ["band_idx", "band_key"])
            .select(
                F.col("n.doc_id").alias("new_id"),
                F.col("i.doc_id").alias("old_id"),
            )
            .distinct()
        )
        # exact-Jaccard verify, candidate-bounded: the batch is shingled
        # once (batch-sized); admitted-side shingles are recomputed only
        # for candidate docs
        old_ids = cand_ids.select("old_id").distinct()
        sh_batch = _with_shingles(batch, "doc_id", "text", 3, persist=False)
        sh_old = _with_shingles(
            admitted.join(old_ids, admitted.doc_id == old_ids.old_id).select(
                "doc_id", "text"
            ),
            "doc_id", "text", 3, persist=False,
        )
        ex_batch = sh_batch.select(
            F.col("doc_id").alias("doc_a"), F.explode("shingles").alias("s")
        )
        ex_old = sh_old.select(
            F.col("doc_id").alias("doc_b"), F.explode("shingles").alias("s")
        )
        inter = (
            cand_ids.select(
                F.col("new_id").alias("doc_a"), F.col("old_id").alias("doc_b")
            )
            .join(ex_batch, "doc_a")
            .join(ex_old, ["doc_b", "s"])
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
        sizes = sh_batch.select("doc_id", F.size("shingles").alias("n")).union(
            sh_old.select("doc_id", F.size("shingles").alias("n"))
        )
        dup_vs_corpus = (
            _jaccard_from_inter(inter, sizes)
            .where(F.col("jaccard") >= self.threshold)
            .select(F.col("doc_a").alias("doc_id"))
            .union(  # exact-id replay of an admitted doc is also a dup
                cand_ids.where(F.col("new_id") == F.col("old_id")).select(
                    F.col("new_id").alias("doc_id")
                )
            )
            .distinct()
        )

        # --- batch-internal dedup: LSH candidates, exact-verified, keep
        # the min doc_id of each verified pair ---
        intra_cands = (
            new_bands.alias("x")
            .join(new_bands.alias("y"), ["band_idx", "band_key"])
            .where(F.col("x.doc_id") < F.col("y.doc_id"))
            .select(
                F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
            )
            .distinct()
        )
        ex_b2 = ex_batch.select(F.col("doc_a").alias("doc_b"), "s")
        intra_inter = (
            intra_cands.join(ex_batch, "doc_a")
            .join(ex_b2, ["doc_b", "s"])
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
        intra = (
            _jaccard_from_inter(
                intra_inter, sh_batch.select("doc_id", F.size("shingles").alias("n"))
            )
            .where(F.col("jaccard") >= self.threshold)
            .select(F.col("doc_b").alias("doc_id"))
            .distinct()
        )

        rejected = dup_vs_corpus.union(intra).distinct()
        if self.eval_grams is not None:
            # leak guard in the same pass: contaminated docs are
            # rejected before they can enter the store or the index
            from polygon_daily_market_data_pipeline_spark.operators.decontam import (
                contamination_hits,
            )

            contam = contamination_hits(
                batch, self.eval_grams, n=self.decontam_n
            ).select("doc_id")
            rejected = rejected.union(contam).distinct()
        survivors = batch.join(rejected, "doc_id", "left_anti").localCheckpoint(
            eager=True
        )
        if survivors.isEmpty():
            return
        survivors.write.mode("append").parquet(self.docs_path)
        # The survivors' band rows are a subset of ``new_bands`` (bands
        # are a deterministic per-row map of (doc_id, text), and
        # survivors ⊆ batch with identical text), so filter the
        # already-computed checkpointed bands instead of re-shingling
        # and re-MinHashing the survivor docs — the appended index rows
        # are value-identical, at half the per-batch signature cost.
        # ``distinct()`` on the id side (ADVICE r16 #1): should a batch
        # ever carry duplicate doc_ids, the join must not multiply band
        # rows vs the old band_index(survivors) path.
        new_bands.join(
            F.broadcast(survivors.select("doc_id").distinct()), "doc_id"
        ).write.mode("append").parquet(self.bands_path)

    def attach(self, stream: DataFrame, checkpoint_dir: str) -> StreamingQuery:
        """Wire the sink to a streaming DataFrame of (doc_id, text)."""
        return (
            stream.writeStream.foreachBatch(self.process)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
