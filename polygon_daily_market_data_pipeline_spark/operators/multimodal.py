"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Media are opaque ``binary`` columns with typed metadata, processed by
Arrow-batched ``mapInPandas`` stages — the only place Python belongs in
the hot path, because media decode is a per-blob C-library call, not a
relational expression.

The decode kernels themselves are STUBBED (this container has no
image/audio libs): ``decoder="fake"`` is a deterministic stand-in that
derives features from the blob bytes, so the Spark-side plumbing —
schema, batch iteration, partitioning, UDF signature — is real and
tested; swapping in Pillow/librosa/pyav is a one-function change
(``decoder="pillow"`` raises NotImplementedError with the wiring point).

Scale notes: blobs ride in parquet binary columns; keep
``spark.sql.files.maxPartitionBytes`` sized so a batch of blobs fits
executor memory; never collect blobs to the driver; frame sampling
emits rows (explode-like) inside the same pass so no second shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image|audio|video
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
        StructField("content", BinaryType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, n_bytes long, mean_byte double, byte_entropy double, "
    "phash string"
)

FRAME_SAMPLE_SCHEMA = "media_id long, frame_idx int, frame_ms int, frame_sig string"


def _fake_decode_features(content: bytes) -> dict:
    """Deterministic stand-in for image decode + feature extraction."""
    import hashlib
    import math

    n = len(content)
    mean = sum(content) / n if n else 0.0
    # byte histogram entropy
    if n:
        counts: dict[int, int] = {}
        for b in content:
            counts[b] = counts.get(b, 0) + 1
        ent = -sum((c / n) * math.log2(c / n) for c in counts.values())
    else:
        ent = 0.0
    return {
        "n_bytes": n,
        "mean_byte": mean,
        "byte_entropy": ent,
        "phash": hashlib.md5(content).hexdigest()[:16],
    }


def extract_image_features(
    media: DataFrame, decoder: str = "fake"
) -> DataFrame:
    """Arrow-batched feature extraction over binary image blobs."""
    if decoder != "fake":
        raise NotImplementedError(
            f"decoder={decoder!r}: wire a real image library (e.g. Pillow) "
            "into _fake_decode_features's slot; the container ships none."
        )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = [_fake_decode_features(bytes(b or b"")) for b in pdf["content"]]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf["media_id"].to_numpy())
            yield out

    return media.where("kind = 'image'").select("media_id", "content").mapInPandas(
        run, IMAGE_FEATURES_SCHEMA
    )


def sample_video_frames(
    media: DataFrame, every_ms: int = 1000, decoder: str = "fake"
) -> DataFrame:
    """Frame sampling: one output row per sampled frame — the
    explode-shaped mapInPandas pattern (row count grows inside the
    pass; no join back needed)."""
    if decoder != "fake":
        raise NotImplementedError(
            f"decoder={decoder!r}: wire pyav/ffmpeg here for real frame decode."
        )

    def run(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, dur, content in zip(
                pdf["media_id"], pdf["duration_ms"], pdf["content"]
            ):
                blob = bytes(content or b"")
                dur = int(dur or 0)
                for i, ms in enumerate(range(0, max(dur, 1), every_ms)):
                    sig = hashlib.md5(blob + ms.to_bytes(8, "little")).hexdigest()[:12]
                    rows.append((int(mid), i, ms, sig))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "frame_ms", "frame_sig"]
            )

    return (
        media.where("kind = 'video'")
        .select("media_id", "duration_ms", "content")
        .mapInPandas(run, FRAME_SAMPLE_SCHEMA)
    )
