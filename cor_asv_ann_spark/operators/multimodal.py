"""Multimodal column plumbing: media spans as opaque binary + typed
metadata, with decode/feature-extraction as Arrow-batched mapInPandas.

The media decode itself (image resize, audio resample, frame sampling)
needs codecs that are not in this container — the decode step is a
clearly-marked deterministic STUB (or NotImplementedError for real
codecs), but everything Spark-side is real and tested: schema,
partitioning by media type, UDF signature, Arrow batch shape, and the
join back to the owning document/span.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),  # opaque bytes
        T.StructField("meta_width", T.IntegerType(), True),
        T.StructField("meta_height", T.IntegerType(), True),
        T.StructField("meta_duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType(), False), False),
    ]
)

FEATURE_DIM = 16


def synth_media_table(spark: SparkSession, spans_df: DataFrame) -> DataFrame:
    """Materialize a media table from the spans table's media anchors:
    payload bytes are a deterministic function of media_ref (stands in
    for reading the blob store)."""
    media = (
        spans_df.select("doc_id", F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "media")
        .select("doc_id", F.col("s.media_ref").alias("media_ref"))
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, ref in zip(pdf["doc_id"], pdf["media_ref"]):
                seed = hashlib.md5(ref.encode()).digest()
                rows.append(
                    {
                        "media_ref": ref,
                        "doc_id": doc_id,
                        "media_type": ["image", "audio", "video"][seed[0] % 3],
                        "payload": seed * 8,  # 128 deterministic bytes
                        "meta_width": 64 + seed[1] % 192,
                        "meta_height": 64 + seed[2] % 192,
                        "meta_duration_ms": int.from_bytes(seed[3:5], "big"),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields])

    return media.mapInPandas(gen, schema=MEDIA_SCHEMA)


def decode_stub(payload: bytes, media_type: str) -> np.ndarray:
    """STUB decode: real implementation would dispatch to PIL/ffmpeg —
    neither is in this container. Deterministic fake: hash-seeded
    pseudo-pixels so the downstream feature math is exercised with real
    array shapes. Raises for unknown types exactly like a codec would."""
    if media_type not in ("image", "audio", "video"):
        raise NotImplementedError(f"no codec for media_type={media_type!r}")
    seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.random(64, dtype=np.float64).astype(np.float32)


def extract_features(media: DataFrame) -> DataFrame:
    """Decode (stubbed) + mean-pooled feature vector per media object,
    Arrow-batched; repartitioned by media_type so one codec's working
    set stays together (the real-decoder locality argument)."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats = []
            for payload, mtype in zip(pdf["payload"], pdf["media_type"]):
                raw = decode_stub(bytes(payload), mtype)
                feats.append(raw.reshape(FEATURE_DIM, -1).mean(axis=1).tolist())
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "feature": feats,
                }
            )

    return media.repartition("media_type").mapInPandas(featurize, schema=FEATURE_SCHEMA)
