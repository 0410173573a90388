"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata
structs; heavy per-item work runs in Arrow-batched ``mapInPandas``
kernels so a 100 TB corpus streams through Python in bounded-memory
batches. The actual codecs (PIL/ffmpeg/librosa) are NOT available in
this environment, so the decode step is stubbed: ``decode_stub=True``
yields deterministic fake features (shape-correct, content-derived),
while ``decode_stub=False`` raises ``NotImplementedError`` at the point
a real codec would be invoked. Everything Spark-side — schema,
partitioning, batch iteration, UDF signatures — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),   # image | audio | video
        T.StructField("format", T.StringType()),        # png, wav, mp4, ...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)


def attach_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Cheap header sniffing as pure expressions: recognizes PNG/JPEG/RIFF
    magic bytes without decoding. Unknown formats get NULL fields."""
    head = F.hex(F.substring(F.col(payload_col), 1, 4))
    fmt = (
        F.when(head.startswith("89504E47"), F.lit("png"))
        .when(head.startswith("FFD8FF"), F.lit("jpeg"))
        .when(head.startswith("52494646"), F.lit("riff"))
        .otherwise(F.lit(None))
    )
    media_type = (
        F.when(fmt.isin("png", "jpeg"), F.lit("image")).when(fmt == "riff", F.lit("audio")).otherwise(F.lit(None))
    )
    meta = F.struct(
        media_type.alias("media_type"),
        fmt.alias("format"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("double").alias("duration_s"),
        F.lit(None).cast("int").alias("sample_rate"),
    )
    return df.withColumn("media_meta", meta)


def _fake_features(payload: bytes, n: int) -> np.ndarray:
    """Deterministic content-derived pseudo-features (the decode stub)."""
    digest = hashlib.sha256(payload if payload is not None else b"").digest()
    seed = int.from_bytes(digest[:4], "big")
    rng = np.random.RandomState(seed)
    return rng.standard_normal(n).astype(np.float32)


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    feature_dim: int = 64,
    batch_size: int = 256,
    decode_stub: bool = True,
) -> DataFrame:
    """Per-item feature extraction via ``mapInPandas``.

    The kernel iterates Arrow batches (bounded memory), decodes each
    payload (stubbed), and emits (id, features). Real deployments swap
    ``_fake_features`` for a codec + model call; the Spark plumbing is
    unchanged.
    """
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for s in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[s : s + batch_size]
                if decode_stub:
                    feats = [_fake_features(p, feature_dim).tolist() for p in chunk[payload_col]]
                else:
                    raise NotImplementedError(
                        "real media decoding requires codec libraries not present in this environment"
                    )
                yield pd.DataFrame({id_col: chunk[id_col].values, "features": feats})

    return df.select(id_col, payload_col).mapInPandas(kernel, schema=schema)


def sample_video_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    every_n_seconds: float = 1.0,
    max_frames: int = 8,
    decode_stub: bool = True,
) -> DataFrame:
    """Frame sampling plumbing: one output row per sampled frame with a
    frame index and (stubbed) frame payload."""
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for _, row in pdf.iterrows():
                if not decode_stub:
                    raise NotImplementedError("video decoding requires ffmpeg, not present here")
                payload = row[payload_col] or b""
                n = min(max_frames, max(1, len(payload) // 64))
                for i in range(n):
                    ids.append(row[id_col])
                    idxs.append(i)
                    frames.append(hashlib.sha256(payload + i.to_bytes(4, "big")).digest())
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    return df.select(id_col, payload_col).mapInPandas(kernel, schema=schema)
