from __future__ import annotations

import datetime as dt

import pytest

from esg_decarbonization_data_integration_and_data_pipline_spark.pipelines.rec_quarters import rec_quarters


def test_rec_quarter_split_and_correction(spark):
    targets = spark.createDataFrame(
        [("WZS", 2024, 4000.0)], "site string, year int, amount double")
    actuals = spark.createDataFrame(
        [("WZS", 2024, 2, 1500.0)], "site string, year int, quarter int, amount double")
    out = {r.quarter: r for r in rec_quarters(
        {"rec_targets": targets, "rec_actuals": actuals}).collect()}
    assert len(out) == 4
    # even split except the corrected quarter
    assert out[1].amount == 1000.0 and out[1].source == "target"
    assert out[2].amount == 1500.0 and out[2].source == "actual"
    assert out[2].target_amount == 1000.0
    # calendar windows: Q2 = Apr..Jun, leap-agnostic last_day
    assert out[2].period_start == dt.date(2024, 4, 1)
    assert out[2].period_end == dt.date(2024, 6, 30)
    assert out[4].period_end == dt.date(2024, 12, 31)
