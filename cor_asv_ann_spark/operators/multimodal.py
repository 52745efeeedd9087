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


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("meta_width", T.IntegerType(), False),
        T.StructField("meta_height", T.IntegerType(), False),
    ]
)


def resize_images(media: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """Image resize as an Arrow-batched mapInPandas over the image rows
    only (filter pushes to the media scan). The pixel resample itself
    is the stubbed decode (PIL absent from this container) — real are:
    the type filter, the batch shape, the payload-in/payload-out UDF
    signature a real resizer drops into, and the metadata rewrite
    (meta_width/height reflect the TARGET size, the contract downstream
    consumers read)."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out_payloads = []
            for payload, mtype in zip(pdf["payload"], pdf["media_type"]):
                pixels = decode_stub(bytes(payload), str(mtype))
                # stub resample: deterministic re-hash at target geometry
                # (a real impl: PIL Image.resize on the decoded array)
                out_payloads.append(
                    hashlib.md5(
                        pixels.tobytes() + f"{width}x{height}".encode()
                    ).digest()
                )
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "doc_id": pdf["doc_id"],
                    "payload": out_payloads,
                    "meta_width": width,
                    "meta_height": height,
                }
            )

    return (
        media.filter(F.col("media_type") == "image")
        .mapInPandas(resize, schema=RESIZED_SCHEMA)
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("t_ms", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), False),
    ]
)


def sample_frames(media: DataFrame, every_ms: int = 1000, max_frames: int = 16) -> DataFrame:
    """Video frame sampling: one output ROW per sampled frame (the
    1→N generate shape a real ffmpeg-backed sampler has), timestamps
    from the real duration metadata, frame count bounded by
    ``max_frames`` (the cap a 10-hour video needs so one row cannot
    explode an Arrow batch). Frame bytes are the stubbed decode."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for ref, doc_id, payload, dur in zip(
                pdf["media_ref"], pdf["doc_id"], pdf["payload"],
                pdf["meta_duration_ms"],
            ):
                # meta_duration_ms is nullable (schema line 31): a null
                # duration still yields the min-1-frame row
                dur = 0 if pd.isna(dur) else int(dur)
                n = min(max(dur // every_ms, 1), max_frames)
                for i in range(n):
                    t = i * every_ms
                    rows.append(
                        {
                            "media_ref": ref,
                            "doc_id": doc_id,
                            "frame_idx": i,
                            "t_ms": t,
                            "frame": hashlib.md5(
                                bytes(payload) + t.to_bytes(4, "big")
                            ).digest(),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return (
        media.filter(F.col("media_type") == "video")
        .mapInPandas(sample, schema=FRAME_SCHEMA)
    )
