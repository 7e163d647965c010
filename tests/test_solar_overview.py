from __future__ import annotations

import datetime as dt

import pytest

from esg_decarbonization_data_integration_and_data_pipline_spark.pipelines.solar_overview import (
    solar_overview,
)

P = dt.date(2023, 7, 1)
SCHEMA = ("site string, plant string, category string, amount double, "
          "ytm_amount double, period_start date")


def _tables(spark):
    solar = spark.createDataFrame(
        [("AAA", "P1", "actual", 100.0, 100.0, P),
         ("AAA", "P1", "target", 200.0, 200.0, P),
         ("WZS", "W1", "actual", 10.0, 10.0, P),
         ("WZS", "W2", "actual", 30.0, 30.0, P),
         ("WZS", "W1", "target", 20.0, 20.0, P)], SCHEMA)
    remain = spark.createDataFrame(
        [("AAA", "P1", 5.0, 5.0, P)],
        "site string, plant string, amount double, ytm_amount double, "
        "period_start date")
    # presence row gets plant='ALL' into the whitelist, mirroring
    # deployments whose staging series carry rollup rows
    info = spark.createDataFrame([("WZS", "ALL", "info", 0.0, 0.0, P)], SCHEMA)
    other = spark.createDataFrame([], SCHEMA)
    elect_total = spark.createDataFrame(
        [("AAA", "P1", "actual", 500.0, 500.0, P),
         ("AAA", "P1", "target", 400.0, 400.0, P),
         ("AAA", "P9", "actual", 777.0, 777.0, P),   # plant not in overview
         ("WZS", "W1", "actual", 100.0, 100.0, P),
         ("WZS", "W2", "actual", 60.0, 60.0, P),
         ("WZS", "W1", "target", 40.0, 40.0, P),
         ("WIHK", "X1", "actual", 999.0, 999.0, P)],  # excluded site
        SCHEMA)
    return {"solar": solar, "solar_remain": remain, "solar_info": info,
            "solar_other": other, "elect_total": elect_total}


def test_solar_overview_assembly(spark):
    rows = solar_overview(_tables(spark)).collect()
    by_key = {(r.site, r.plant, r.category): r for r in rows}

    # actual = actual_use + remain; all six series present
    assert by_key[("AAA", "P1", "actual")].amount == 105.0
    assert by_key[("AAA", "P1", "actual_use")].amount == 100.0
    assert by_key[("AAA", "P1", "remain")].amount == 5.0
    assert by_key[("AAA", "P1", "target")].amount == 200.0
    assert ("WZS", "ALL", "info") in by_key

    # per-plant ratios for regular sites (x100, reconstructed actual)
    assert by_key[("AAA", "P1", "solar_ratio_actual")].amount == pytest.approx(21.0)
    assert by_key[("AAA", "P1", "solar_ratio_target")].amount == pytest.approx(50.0)
    assert by_key[("AAA", "P1", "elect_total_actual")].amount == 500.0
    assert by_key[("AAA", "P1", "elect_total_target")].amount == 400.0

    # packaged sites roll to site level with plant='ALL'
    assert by_key[("WZS", "ALL", "solar_ratio_actual")].amount == pytest.approx(
        (10 + 30) / (100 + 60) * 100)
    assert by_key[("WZS", "ALL", "solar_ratio_target")].amount == pytest.approx(50.0)
    assert by_key[("WZS", "ALL", "elect_total_actual")].amount == 160.0
    assert by_key[("WZS", "ALL", "elect_total_target")].amount == 40.0
    # no per-plant elect/ratio rows for packaged sites
    assert ("WZS", "W1", "elect_total_actual") not in by_key
    assert ("WZS", "W1", "solar_ratio_actual") not in by_key

    # whitelist: plants absent from the six-series overview are dropped,
    # and the excluded site never enters the regular branch
    assert not [r for r in rows if r.plant == "P9"]
    assert not [r for r in rows if r.site == "WIHK"]


def test_solar_overview_null_denominator(spark):
    t = _tables(spark)
    t["elect_total"] = t["elect_total"].filter("site != 'AAA'")
    rows = solar_overview(t).collect()
    r = {(x.site, x.plant, x.category): x for x in rows}[
        ("AAA", "P1", "solar_ratio_actual")]
    assert r.amount is None  # missing denominator -> NULL, not inf
