from __future__ import annotations

import datetime as dt

import pytest

from esg_decarbonization_data_integration_and_data_pipline_spark.pipelines.green_elect_overview import (
    green_elect_overview,
)

P = dt.date(2023, 7, 1)


def _tables(spark):
    provider_target = spark.createDataFrame(
        [("AAA", 100.0, 700.0, P), ("WZS", 50.0, 350.0, P)],
        "site string, target double, target_ytm double, period_start date")
    elect_total = spark.createDataFrame(
        [("AAA", "P1", "target", 1000.0, 7000.0, P),
         ("AAA", "P1", "actual", 999.0, 999.0, P),      # non-target dropped
         ("WZS", "W1", "target", 300.0, 2100.0, P),
         ("WZS", "W2", "target", 200.0, 1400.0, P)],
        "site string, plant string, category string, amount double, "
        "ytm_amount double, period_start date")
    electricity_decarb = spark.createDataFrame(
        [("AAA", "ALL", 900.0, 6300.0, P),
         ("WZS", "ALL", 450.0, 3150.0, P),
         ("ALL", "ALL", 1350.0, 9450.0, P),   # fleet rollup row excluded
         ("AAA", "BO1", 1.0, 1.0, P)],        # per-BO row excluded
        "site string, bo string, amount double, ytm_amount double, "
        "period_start date")
    renewable = spark.createDataFrame(
        [("AAA", "ALL", "green_electricity", 80.0, 560.0, P),
         ("WZS", "ALL", "green_electricity", 40.0, 280.0, P),
         ("AAA", "ALL", "solar", 5.0, 35.0, P),          # other category
         ("ZRO", "ALL", "green_electricity", 0.0, 0.0, P)],  # ytm=0 filtered
        "site string, bo string, category string, amount double, "
        "ytm_amount double, period_start date")
    year_target = spark.createDataFrame(
        [("AAA", "prov-a", 2023, 1, 10.0), ("AAA", "prov-a", 2023, 2, 20.0),
         ("AAA", "prov-b", 2023, 1, 5.0), ("WZS", "prov-a", 2023, 3, 7.0),
         ("AAA", "prov-a", 2022, 1, 999.0)],  # other year excluded
        "site string, provider string, year int, month int, amount double")
    simulate = spark.createDataFrame(
        [("AAA", 2023, 2, 2023, True, 600.0),
         ("WZS", 2023, 2, 2023, True, 400.0),
         ("AAA", 2023, 3, 2023, False, 111.0),   # not validated
         ("AAA", 2023, 1, 2023, True, 222.0)],   # superseded version
        "site string, year int, version int, version_year int, "
        "validate boolean, amount double")
    green_price = spark.createDataFrame(
        [("AAA", 2.0), ("WIHK-1", 3.0), ("WIHK-2", 3.0), ("WZS", 4.0)],
        "site string, amount double")
    coef = spark.createDataFrame(
        [("AAA", 0.5), ("WZS", 0.509)], "site string, amount double")
    area_mapping = spark.createDataFrame(
        [("AAA", "TW", "台灣"), ("WZS", "TW", "台灣")],
        "site string, nation string, area string")
    return {"provider_target": provider_target, "elect_total": elect_total,
            "electricity_decarb": electricity_decarb,
            "renewable_energy_decarb": renewable,
            "year_target": year_target, "simulate": simulate,
            "green_price": green_price, "coef": coef,
            "area_mapping": area_mapping, "target_year": 2023}


def test_green_elect_overview_assembly(spark):
    rows = green_elect_overview(_tables(spark)).collect()
    by_key = {(r.site, r.provider): r for r in rows}

    a = by_key[("AAA", "prov-a")]
    assert a.target == 100.0 and a.target_ytm == 700.0
    assert a.actual == 80.0 and a.actual_ytm == 560.0
    # *_all columns are fleet-wide period sums (reference drops the
    # per-site values in df1_site and attaches the groupby(period)
    # totals): regular 1000 + packaged 300+200 = 1500
    assert a.target_all == 1500.0
    assert a.target_ytm_all == 10500.0
    assert by_key[("WZS", "prov-a")].target_all == 1500.0
    assert (a.actual_all, a.actual_ytm_all) == (1350.0, 9450.0)
    # packaged-site plants were summed to site level BEFORE the outer
    # join -- exactly one row per (site, provider), no fan-out
    assert len(rows) == len(by_key)
    # year targets: per-provider month sums; fleet target from the
    # latest validated simulate version only (600 + 400)
    assert a.year_target == 30.0
    assert by_key[("AAA", "prov-b")].year_target == 5.0
    assert a.year_target_all == 1000.0
    # unit = (actual/1000*coef) / (actual/1000*price_diff) = coef/price
    assert a.unit == pytest.approx(0.5 / 2.0)
    assert a.unit_ytm == pytest.approx(0.5 / 2.0)
    assert a.year == 2023 and a.month == 7 and a.area == "台灣"
    # ytm=0 site and unknown-area sites dropped
    assert not [r for r in rows if r.site == "ZRO"]


def test_green_elect_overview_zero_price_null_unit(spark):
    t = _tables(spark)
    t["green_price"] = t["green_price"].filter("site != 'AAA'")
    rows = green_elect_overview(t).collect()
    a = {(r.site, r.provider): r for r in rows}[("AAA", "prov-a")]
    assert a.price_diff == 0.0 and a.unit is None  # NULL, not inf/NaN
