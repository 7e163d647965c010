from __future__ import annotations

import pytest

from esg_decarbonization_data_integration_and_data_pipline_spark.pipelines.shipments import (
    MONTH_COLS, assemble_shipments, upload_shipments,
)

SCHEMA = "site string, " + ", ".join(f"`{m}` double" for m in MONTH_COLS)


def _block(spark, values):
    return spark.createDataFrame(values, SCHEMA)


def test_assemble_shipments(spark):
    b0 = _block(spark, [("AAA", *[float(m) for m in range(1, 13)]),
                        ("BBB", *([None] * 12)),
                        ("總計", *[99.0] * 12)])
    b1 = _block(spark, [("AAA", *[10.0] * 12)])
    b2 = _block(spark, [("AAA", *[20.0] * 12)])
    b3 = _block(spark, [("AAA", *[30.0] * 12)])
    out = assemble_shipments([b0, b1, b2, b3], 2024, "alex").collect()

    by_key = {(r.site, r.year, r.month): r for r in out}
    # block offsets become years
    assert by_key[("AAA", 2024, 3)].amount == 3.0
    assert by_key[("AAA", 2025, 7)].amount == 10.0
    assert by_key[("AAA", 2027, 1)].amount == 30.0
    # grand-total row dropped, nulls zero-filled, metadata stamped
    assert not [r for r in out if r.site == "總計"]
    assert by_key[("BBB", 2024, 5)].amount == 0.0
    r = by_key[("AAA", 2024, 1)]
    assert r.version == 2024 and r.pic == "alex"
    # 2 sites x 12 months + 3 single-site blocks x 12
    assert len(out) == 24 + 36


def test_upload_shipments_gated_without_openpyxl(spark):
    try:
        import openpyxl  # noqa: F401
        pytest.skip("openpyxl present; gate not reachable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="openpyxl"):
        upload_shipments(spark, "/nonexistent.xlsx")
