"""Multimodal-column queries over the documents table.

The testdata has no real image/audio blobs, so the media table is
derived deterministically from ``documents`` (content = the UTF-8 bytes
of the text, kind round-robins by doc_id, duration = n_chars) — which
makes the Arrow/mapInPandas decode plumbing fully exercisable AND
oracle-checkable: byte length, md5-based phash, and frame-sampling
cadence all have exact DuckDB twins. The decode kernel itself is the
deterministic stub (``operators/multimodal.py``); swapping in a real
image/audio library changes only that kernel, not this plumbing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from polygon_daily_market_data_pipeline_spark.operators.multimodal import (
    extract_image_features,
    sample_video_frames,
)
from polygon_daily_market_data_pipeline_spark.plans.analytics import register
from polygon_daily_market_data_pipeline_spark.sources.tables import load_table

KINDS = ("image", "audio", "video")


def media_from_documents(docs: DataFrame) -> DataFrame:
    """documents → MEDIA_SCHEMA-shaped frame: opaque binary content +
    typed metadata, kind assigned round-robin on doc_id."""
    kind = F.element_at(F.array(*[F.lit(k) for k in KINDS]), (F.col("doc_id") % 3 + 1).cast("int"))
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.concat(F.lit("application/x-fake-"), kind).alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.col("n_chars").cast("int").alias("duration_ms"),
        F.encode("text", "UTF-8").alias("content"),
    )


@register(
    "media_image_features",
    """
    SELECT doc_id AS media_id,
           octet_length(encode(text)) AS n_bytes,
           substring(md5(text), 1, 16) AS phash
    FROM documents
    WHERE doc_id % 3 = 0
    ORDER BY media_id
    """,
)
def media_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary image columns → Arrow-batched mapInPandas feature
    extraction. Oracle checks the content-addressed features (byte
    length, md5 phash); mean_byte/byte_entropy are computed in the same
    pass but have no SQL twin, so they are projected out here and
    asserted in tests/test_llm_ops.py instead."""
    media = media_from_documents(load_table(spark, sf_dir, "documents"))
    feats = extract_image_features(media)
    return feats.select("media_id", "n_bytes", "phash").orderBy("media_id")


@register(
    "media_frame_samples",
    """
    SELECT doc_id AS media_id,
           CAST(f.ms // 1000 AS INT) AS frame_idx,
           CAST(f.ms AS INT) AS frame_ms
    FROM documents,
         LATERAL (SELECT unnest(range(0, greatest(n_chars, 1), 1000)) AS ms) f
    WHERE doc_id % 3 = 2
    ORDER BY media_id, frame_idx
    """,
)
def media_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling (1 row per sampled frame, emitted inside the
    same mapInPandas pass — explode-shaped, no second shuffle). Oracle
    checks the sampling cadence; the frame signature is content-hash
    plumbing asserted in tests."""
    media = media_from_documents(load_table(spark, sf_dir, "documents"))
    frames = sample_video_frames(media, every_ms=1000)
    return frames.select("media_id", "frame_idx", "frame_ms").orderBy(
        "media_id", "frame_idx"
    )
