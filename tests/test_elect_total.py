"""Plant-level elect_total assembly: ratio disaggregation +
target/actual union + YTM (reference raw_to_staging.py:670-845)."""

from __future__ import annotations

import datetime as dt

import pytest

from esg_decarbonization_data_integration_and_data_pipline_spark.pipelines.elect_total import (
    disaggregate_site_to_plant, elect_total,
)


def _frames(spark):
    jan, feb = dt.date(2024, 1, 1), dt.date(2024, 2, 1)
    mar = dt.date(2024, 3, 1)
    targets = spark.createDataFrame(
        [("WKS", jan, 1000.0), ("WKS", feb, 1000.0), ("WOK", jan, 300.0),
         ("WKS", mar, 500.0)],   # no ratio row for March
        "site string, period_start date, amount double")
    actuals = spark.createDataFrame(
        [("WKS", jan, 900.0), ("WOK", jan, 290.0)],
        "site string, period_start date, amount double")
    wks_ratio = spark.createDataFrame(
        [("WKS-5", jan, 0.6), ("WKS-6", jan, 0.4),
         ("WKS-5", feb, 0.7), ("WKS-6", feb, 0.3)],
        "plant string, period_start date, ratio double")
    return targets, actuals, {"WKS": wks_ratio}


def test_disaggregate_splits_ratio_sites_and_passes_others(spark):
    targets, _, ratios = _frames(spark)
    out = {(r.plant, r.period_start.month): r.amount
           for r in disaggregate_site_to_plant(targets, ratios).collect()}
    assert out[("WKS-5", 1)] == pytest.approx(600.0)
    assert out[("WKS-6", 2)] == pytest.approx(300.0)
    assert out[("WOK", 1)] == 300.0            # pass-through plant=site
    # ratio gap: falls back to identity instead of a NULL-plant row
    assert out[("WKS", 3)] == 500.0
    assert len(out) == 6


def test_elect_total_labels_and_ytm(spark):
    targets, actuals, ratios = _frames(spark)
    rows = elect_total(targets, actuals, ratios).collect()
    by_key = {(r.plant, r.category, r.period_start.month): r for r in rows}
    # YTM accumulates within (year, plant, category)
    assert by_key[("WKS-5", "target", 1)].ytm_amount == pytest.approx(600.0)
    assert by_key[("WKS-5", "target", 2)].ytm_amount == pytest.approx(1300.0)
    assert by_key[("WKS-5", "actual", 1)].amount == pytest.approx(540.0)
    assert by_key[("WOK", "actual", 1)].ytm_amount == 290.0
    assert by_key[("WKS-6", "target", 1)].site == "WKS"
