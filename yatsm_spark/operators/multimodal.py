"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Training-data-pipeline addition (task brief): image/audio/video travel as
`binary` columns with typed metadata; decode / feature-extract run as
Arrow-batched pandas UDFs over mapInPandas. The image/audio libs are NOT in
this container, so the decode step is STUBBED (deterministic fake features
+ NotImplementedError for real decode), while everything Spark-side —
schema, batch shape, partitioning, UDF signature — is real and tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("payload", T.BinaryType(), False),
    T.StructField("media_type", T.StringType(), False),
    T.StructField("n_bytes", T.LongType(), False),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("media_type", T.StringType(), False),
    T.StructField("n_bytes", T.LongType(), False),
    T.StructField("sha1", T.StringType(), False),
    T.StructField("feature", T.ArrayType(T.FloatType()), False),
])

_MAGIC = {b"\xff\xd8\xff": "image/jpeg", b"\x89PNG": "image/png",
          b"RIFF": "audio/wav", b"\x00\x00\x00": "video/mp4"}


def as_media_table(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Wrap any table's bytes as an opaque media table (test harness: the
    documents table stands in for a blob store)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        F.col(id_col).cast("long").alias("media_id"),
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("media_type"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
    )


def sniff_media_type(media: DataFrame) -> DataFrame:
    """Magic-byte sniffing — pure Catalyst (substr on binary + CASE)."""
    head = F.col("payload").substr(1, 4)
    expr = F.lit("application/octet-stream")
    for magic, mt in _MAGIC.items():
        expr = F.when(head.substr(1, len(magic)) == F.lit(magic), F.lit(mt)).otherwise(expr)
    return media.withColumn("media_type", expr)


def decode_image(payload: bytes) -> np.ndarray:  # pragma: no cover - stub
    """REAL decode would go through PIL/libvips here; not in container."""
    raise NotImplementedError("image decode requires PIL/libvips — not installed")


def _fake_feature(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in feature: sha1-seeded unit vector. Replaces
    the decode→embed path so downstream plumbing (ANN, dedup on features)
    is exercised with stable values."""
    h = hashlib.sha1(payload).digest()
    v = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32).astype(np.float64)
    v = v / np.linalg.norm(v)
    return v.astype(np.float32)


def extract_features(media: DataFrame, dim: int = 8, batch_hint: int = 1024) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, one row per media
    item out. Partitioning is whatever the source had — no shuffle."""

    def run(batches):
        for pdf in batches:
            payloads = [bytes(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["n_bytes"],
                "sha1": [hashlib.sha1(p).hexdigest() for p in payloads],
                "feature": [_fake_feature(p, dim) for p in payloads],
            })

    return media.mapInPandas(run, FEATURE_SCHEMA)
