"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for image/audio/video at 100 TB: the payload is an opaque
``binary`` column riding alongside typed metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` operators so bytes never round-trip through Python
row-at-a-time. The decode kernels themselves are STUBBED here (no
image/audio libs in this container -- clearly marked below); the
Spark-side plumbing (schema, batching, partitioning, UDF signatures)
is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType, LongType, StringType, StructField, StructType,
)

FEATURE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("media_type", StringType()),
    StructField("payload_bytes", LongType()),
    StructField("payload_sha", StringType()),
    StructField("width", LongType()),
    StructField("height", LongType()),
])


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary column (here: utf-8 bytes of the
    text -- a deterministic stand-in for an image/audio blob) plus
    typed metadata, the schema shape a multimodal pipeline carries."""
    return (df.withColumn("payload", F.encode(F.col(text_col), "utf-8"))
              .withColumn("media_type", F.lit("text/plain"))
              .withColumn("payload_bytes", F.octet_length("payload").cast("bigint")))


def _decode_image_stub(payload: bytes) -> tuple[int, int]:
    """STUB: real image decode (PIL/libvips) is unavailable in this
    container. Deterministic fake: derive WxH from the payload length
    so tests are stable. Replace with a real decoder in production.
    """
    n = len(payload)
    return (n % 640) + 1, (n % 480) + 1


def extract_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched feature extraction over the binary column via
    ``mapInPandas`` -- the real distribution/batching path; only the
    per-payload decode kernel is stubbed."""
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            dims = [_decode_image_stub(p) for p in payloads]
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "media_type": pdf["media_type"],
                "payload_bytes": payloads.map(len).astype("int64"),
                "payload_sha": payloads.map(
                    lambda p: hashlib.sha256(p).hexdigest()),
                "width": pd.Series([d[0] for d in dims], dtype="int64"),
                "height": pd.Series([d[1] for d in dims], dtype="int64"),
            })

    return df.mapInPandas(batches, FEATURE_SCHEMA)
