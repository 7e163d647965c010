"""Regression tests for the round-6 ADVICE items.

- multimodal PNG tiering must fall back to the stub (not crash the
  mapInPandas worker) on payloads with a PNG signature but a corrupt
  body (ADVICE r6 #1);
- png.py must normalize struct/zlib failures to ValueError and bound
  the IDAT inflate by the IHDR-promised size (ADVICE r6 #1/#3);
- sniff_epoch_unit must classify on an aggregate so a sentinel like
  ts=0 landing first can't misclassify the dataset (ADVICE r6 #2);
- asof 'auto' must pick from width-normalized row estimates, not raw
  bytes, so a wide left side can't mask high fan-in (ADVICE r6 #4).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from esg_decarbonization_data_integration_and_data_pipline_spark.operators import multimodal, png
from esg_decarbonization_data_integration_and_data_pipline_spark.tables import sniff_epoch_unit


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data)))


def _corrupt_idat_png() -> bytes:
    """Valid signature + IHDR, garbage (non-zlib) IDAT bytes."""
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    return (png.PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", b"\xff\xfe not zlib \x00\x01")
            + _chunk(b"IEND", b""))


def _short_ihdr_png() -> bytes:
    """Valid signature, IHDR chunk shorter than the 13-byte layout."""
    return (png.PNG_SIGNATURE + _chunk(b"IHDR", b"\x00\x00")
            + _chunk(b"IEND", b""))


def test_corrupt_idat_raises_valueerror_not_zliberror():
    with pytest.raises(ValueError, match="corrupt PNG IDAT"):
        png.png_decode(_corrupt_idat_png())


def test_short_ihdr_raises_valueerror_not_structerror():
    with pytest.raises(ValueError):
        png.png_dims(_short_ihdr_png())
    with pytest.raises(ValueError):
        png.png_decode(_short_ihdr_png())


def test_overlong_idat_is_bounded_and_rejected():
    # IDAT inflates to far more than IHDR promises; the decoder must
    # reject it after at most expected+1 bytes, not inflate it all.
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)  # 2x2 gray
    bomb = zlib.compress(b"\x00" * 1_000_000)
    payload = (png.PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
               + _chunk(b"IDAT", bomb) + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="length mismatch"):
        png.png_decode(payload)


def test_multimodal_kernels_stub_fallback_on_corrupt_png():
    """One bad payload must yield the stub result, never an exception
    escaping the kernel (it would fail the whole Spark task)."""
    bad = _corrupt_idat_png()
    # dims are a header-only read, so they survive a corrupt body...
    assert multimodal._decode_image(bad) == (4, 4)
    # ...but resize must fully decode, hit the zlib error, and stub
    assert (multimodal._resize(bad, 4, 4)
            == multimodal._resize_stub(bad, 4, 4))
    # a short IHDR breaks even the header read -> stub, no struct.error
    short = _short_ihdr_png()
    assert (multimodal._decode_image(short)
            == multimodal._decode_image_stub(short))
    assert (multimodal._resize(short, 4, 4)
            == multimodal._resize_stub(short, 4, 4))


def test_extract_features_survives_corrupt_png_batch(spark):
    """End-to-end: a mixed batch with a corrupt-PNG payload completes
    and the corrupt row gets stub dims."""
    good = png.png_encode(np.zeros((3, 5), dtype=np.uint8))
    short = _short_ihdr_png()
    df = spark.createDataFrame(
        [(1, good, "image/png"), (2, short, "image/png")],
        "doc_id bigint, payload binary, media_type string")
    df = df.withColumn("payload_bytes", F.octet_length("payload"))
    rows = {r.doc_id: (r.width, r.height)
            for r in multimodal.extract_features(df).collect()}
    assert rows[1] == (5, 3)  # real decode
    assert rows[2] == multimodal._decode_image_stub(short)  # stub, no crash


def test_sniff_epoch_unit_ignores_zero_sentinel(spark):
    """A ts=0 sentinel row (epoch start) must not drag classification
    down to 'seconds' when the rest of the column is micros."""
    micros = 1_700_000_000_000_000  # ~2023 in micros
    df = spark.createDataFrame(
        [(0,), (micros,), (micros + 5,)], "ts bigint")
    assert sniff_epoch_unit(df) == "CAST(ts AS BIGINT)"


def test_sniff_epoch_unit_all_null_defaults_nanos(spark):
    df = spark.createDataFrame([(None,), (None,)], "ts bigint")
    assert sniff_epoch_unit(df) == "ts div 1000"


def test_asof_auto_row_normalized_not_byte_ratio(spark):
    """A left side ~20x wider than the right must not suppress 'agg'
    when the right has far more rows: the pick normalizes plan bytes
    by schema width into row estimates."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators import joins

    # narrow right, 1000 rows; wide left (10 string cols), 10 rows
    right = spark.range(1000).selectExpr("id AS k", "id AS t")
    wide = [f"repeat('x', 40) AS pad{i}" for i in range(10)]
    left = spark.range(10).selectExpr("id AS k", "id AS t", *wide)
    assert joins._pick_asof_strategy(left, right) == "agg"
    # and the inverse shape stays window
    assert joins._pick_asof_strategy(right, left) == "window"
