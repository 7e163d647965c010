from __future__ import annotations

import datetime as dt

from esg_decarbonization_data_integration_and_data_pipline_spark.pipelines.solar_rest import (
    solar_from_rest,
)


def test_solar_rest_melt(spark):
    payload = [{"plant": "P1", "actual": 10.0, "target": 12.0},
               {"plant": "P2", "actual": 5.0, "target": None}]
    out = {(r.plant, r.category): r for r in solar_from_rest(
        spark, lambda: payload, dt.date(2023, 12, 1)).collect()}
    assert out[("P1", "actual")].amount == 10.0
    assert out[("P1", "target")].amount == 12.0
    assert out[("P2", "target")].amount is None
    assert str(out[("P1", "actual")].period_start) == "2023-11-01"
    assert out[("P1", "actual")].type == "solar_api"


def test_solar_rest_empty_payload(spark):
    """The reference's own unit-test case: empty API response
    (tests/jobs_source_to_raw_test.py:51)."""
    out = solar_from_rest(spark, lambda: [], dt.date(2023, 12, 1))
    assert out.count() == 0
    assert out.columns == ["plant", "category", "amount",
                           "period_start", "type"]
