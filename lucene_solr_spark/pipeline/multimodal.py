"""Multimodal columns: image/audio/video as opaque `binary` columns with
typed metadata; decode / feature-extract / resize / frame-sample as
Arrow-batched pandas UDFs over mapInPandas.

The container has no image/audio libs, so the DECODE step is stubbed behind
a clearly-marked deterministic fake (task brief) — the Spark-side plumbing
(schema, partitioning, UDF signature, batch shape) is real and tested.
At scale: binary payloads dominate row size -> keep them in their own
column family (parquet column), project them ONLY in the decode stage, and
size spark.sql.files.maxPartitionBytes so one task holds a bounded number
of blobs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("checksum", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)


def _decode_real(payload: bytes):  # pragma: no cover - no codec libs here
    raise NotImplementedError(
        "image/audio decode requires PIL/ffmpeg — not available in this "
        "container; deterministic fake used instead (see _decode_fake)"
    )


def _decode_fake(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a decoder+embedder: bytes -> fixed-dim
    float feature from an md5 rolling digest. Keeps the distributed plumbing
    honest (batching, schema, skew) without native codecs."""
    import hashlib

    h = hashlib.md5(payload).digest()
    return [b / 255.0 for b in h[:dim]]


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction: projects ONLY (media_id, payload) —
    column pruning keeps the wide binary column out of every other stage."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            feats = [_decode_fake(p, dim) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "checksum": pdf["payload"].map(
                        lambda p: hashlib.md5(p).hexdigest()
                    ),
                    "feature": feats,
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, FEATURE_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled timestamp
    (the decode itself is the stubbed step). Demonstrates the explode-style
    1->N row fan-out shape used for frame extraction."""
    n_frames = (F.coalesce(F.col("duration_ms"), F.lit(0)) / every_ms).cast("int")
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0))))
            .alias("frame_idx"),
        )
        .withColumn("ts_ms", F.col("frame_idx") * every_ms)
    )


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes([(i * 7 + j) % 256 for j in range(64 + i % 32)])
        rows.append(
            (
                i,
                kind,
                payload,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 if kind == "image" else None,
                48 if kind == "image" else None,
                3000 + i * 10 if kind == "video" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def audio_chunk_plan(
    media: DataFrame,
    chunk_ms: int = 5000,
    overlap_ms: int = 500,
) -> DataFrame:
    """Audio chunking *plan* for ASR-style training export: fixed-length
    windows with overlap — one row per (media_id, chunk_idx) carrying
    [start_ms, end_ms). The decode/resample of each window is the stubbed
    step (`_decode_real`); the PLAN — stride arithmetic, 1->N fan-out via
    sequence+explode (codegen, no UDF), tail window clipped to duration —
    is the real Spark shape, identical at 10^12 rows. Audio rows without
    a duration chunk as a single unknown-length window (chunk_idx 0,
    end_ms NULL) rather than dropping silently."""
    stride = int(chunk_ms - overlap_ms)
    assert stride > 0
    dur = F.col("duration_ms")
    n_chunks = F.when(
        dur.isNull() | (dur <= 0), F.lit(1)
    ).otherwise(
        F.greatest(
            F.ceil((dur - F.lit(overlap_ms)) / F.lit(stride)).cast("int"),
            F.lit(1),
        )
    )
    out = (
        media.filter(F.col("kind") == "audio")
        .select("media_id", dur.alias("_dur"), n_chunks.alias("_n"))
        .select(
            "media_id",
            "_dur",
            F.explode(F.sequence(F.lit(0), F.col("_n") - 1)).alias(
                "chunk_idx"
            ),
        )
        .withColumn("start_ms", F.col("chunk_idx") * stride)
        .withColumn(
            "end_ms",
            F.when(F.col("_dur").isNull(), F.lit(None).cast("long"))
            .otherwise(
                F.least(
                    F.col("start_ms") + F.lit(chunk_ms),
                    F.col("_dur").cast("long"),
                )
            ),
        )
        .drop("_dur")
    )
    return out
