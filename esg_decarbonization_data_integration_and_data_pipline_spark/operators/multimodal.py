"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for image/audio/video at 100 TB: the payload is an opaque
``binary`` column riding alongside typed metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` operators so bytes never round-trip through Python
row-at-a-time. The pixel kernels are tiered: real PIL decode/resize
when the lib is importable AND the bytes decode as an image; a real
pure-stdlib PNG codec (operators/png.py) for 8-bit PNG payloads even
without PIL; a clearly-marked deterministic stub for everything else
(this container ships no image libs). The Spark-side plumbing
(schema, batching, partitioning, UDF signatures) is real and tested
either way.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType, LongType, StringType, StructField, StructType,
)

from esg_decarbonization_data_integration_and_data_pipline_spark.operators import png

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


try:  # optional dependency gate (same pattern as openpyxl in sources)
    from PIL import Image as _PIL_Image  # type: ignore
except ImportError:  # container has no image libs; stub kernels below
    _PIL_Image = None


def _decode_image_stub(payload: bytes) -> tuple[int, int]:
    """STUB: deterministic fake dims derived from payload length so
    tests are stable for non-image payloads (the text-bytes fixtures)
    and for containers without image libs."""
    n = len(payload)
    return (n % 640) + 1, (n % 480) + 1


def _decode_image(payload: bytes) -> tuple[int, int]:
    """Per-payload decode: real PIL header read when the lib exists
    AND the bytes are a decodable image; REAL stdlib PNG header read
    for PNG payloads regardless of PIL (operators/png.py -- zlib +
    struct, no image lib needed); deterministic stub otherwise. The
    fallback is per-payload (not per-environment) so mixed corpora
    -- and the text-bytes test fixtures -- behave identically
    whether or not PIL is installed."""
    if _PIL_Image is not None:
        import io

        try:
            with _PIL_Image.open(io.BytesIO(payload)) as im:
                return int(im.width), int(im.height)
        except Exception:
            pass
    if png.is_png(payload):
        try:
            return png.png_dims(payload)
        except (ValueError, struct.error, zlib.error):
            # malformed PNG -> stub like any undecodable payload.
            # png.py normalizes to ValueError; struct/zlib kept as
            # belt-and-braces so one corrupt payload can never fail
            # the whole mapInPandas task.
            pass
    return _decode_image_stub(payload)


def extract_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched feature extraction over the binary column via
    ``mapInPandas`` -- the real distribution/batching path; only the
    per-payload decode kernel is stubbed."""
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            # null payload (e.g. encode of a null text) -> null
            # metadata, mirroring SQL null propagation
            dims = [_decode_image(p) if p is not None else (None, None)
                    for p in payloads]
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "media_type": pdf["media_type"],
                "payload_bytes": pd.array(
                    [len(p) if p is not None else None for p in payloads],
                    dtype="Int64"),
                "payload_sha": payloads.map(
                    lambda p: hashlib.sha256(p).hexdigest()
                    if p is not None else None),
                "width": pd.array([d[0] for d in dims], dtype="Int64"),
                "height": pd.array([d[1] for d in dims], dtype="Int64"),
            })

    return df.mapInPandas(batches, FEATURE_SCHEMA)


def _resize_stub(payload: bytes, width: int, height: int) -> bytes:
    """STUB: deterministic fake resize -- a sliced payload
    proportional to the target pixel count, so sizes and hashes are
    stable for non-image payloads and lib-less containers."""
    want = max(1, min(len(payload), width * height // 64))
    return payload[:want]


def _resize(payload: bytes, width: int, height: int) -> bytes:
    """Per-payload resize: real PIL resample + PNG re-encode when the
    lib exists and the bytes decode as an image; REAL stdlib
    nearest-neighbor resample for 8-bit PNG payloads regardless of
    PIL (operators/png.py); deterministic stub otherwise (same
    mixed-corpus rationale as ``_decode_image``)."""
    if _PIL_Image is not None:
        import io

        try:
            with _PIL_Image.open(io.BytesIO(payload)) as im:
                out = io.BytesIO()
                im.resize((width, height)).save(out, format="PNG")
                return out.getvalue()
        except Exception:
            pass
    if png.is_png(payload):
        try:
            return png.png_resize(payload, width, height)
        except (ValueError, struct.error, zlib.error):
            pass  # unsupported/corrupt PNG flavor -> stub
    return _resize_stub(payload, width, height)


def resize_payloads(df: DataFrame, width: int, height: int,
                    id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched resize over the binary column (mapInPandas):
    the real batching/schema path with the pixel kernel stubbed.
    Output: (doc_id, payload, width, height, payload_bytes)."""
    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("payload_bytes", LongType()),
    ])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            # null payload (e.g. encode of a null text) -> null row,
            # mirroring extract_features' null propagation
            resized = pdf["payload"].map(
                lambda p: _resize(p, width, height) if p is not None
                else None)
            nn = resized.notna()
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "payload": resized,
                "width": pd.array(nn.map(lambda x: width if x else None),
                                  dtype="Int64"),
                "height": pd.array(nn.map(lambda x: height if x else None),
                                   dtype="Int64"),
                "payload_bytes": pd.array(
                    [len(p) if p is not None else None for p in resized],
                    dtype="Int64"),
            })

    return df.mapInPandas(batches, schema)


def sample_frames(df: DataFrame, n_frames: int,
                  frame_bytes: int = 16,
                  id_col: str = "doc_id") -> DataFrame:
    """Frame sampling over a video-like binary column: one output row
    per evenly-spaced frame with its byte offset and slice. PURE JVM
    plumbing (posexplode of the offset sequence + binary substring)
    -- no Python at all, so at 100 TB this is a narrow flatMap whose
    output is ~n_frames x frame_bytes per doc regardless of payload
    size. A real codec would replace the substring with a keyframe
    decoder inside mapInPandas; offsets/batching stay identical.
    """
    step = F.greatest((F.col("payload_bytes") / n_frames)
                      .cast("bigint"), F.lit(1).cast("bigint"))
    return (df.select(F.col(id_col).alias("doc_id"),
                      "payload", "payload_bytes")
              .select("doc_id", "payload", "payload_bytes",
                      F.posexplode(F.sequence(
                          F.lit(0), F.lit(n_frames - 1)))
                       .alias("frame_idx", "__i"))
              .withColumn("frame_offset", F.col("frame_idx") * step)
              .filter(F.col("frame_offset") < F.col("payload_bytes"))
              .withColumn("frame",
                          F.expr(f"substring(payload, "
                                 f"CAST(frame_offset + 1 AS INT), "
                                 f"{frame_bytes})"))
              .select("doc_id", "frame_idx", "frame_offset", "frame"))
