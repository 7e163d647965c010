from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from esg_decarbonization_data_integration_and_data_pipline_spark.pipelines.elect_target import renew_targets
from esg_decarbonization_data_integration_and_data_pipline_spark.pipelines.solar_chain import (
    solar_info_staging, solar_other_staging, solar_remain_staging, solar_staging,
)

J, FEB = dt.date(2023, 1, 1), dt.date(2023, 2, 1)


def test_solar_staging_ytm(spark):
    solar = spark.createDataFrame(
        [("P1", "actual", 10.0, J), ("P1", "actual", 5.0, FEB),
         ("P1", "target", 20.0, J)],
        "plant string, category string, amount double, period_start date")
    mapping = spark.createDataFrame([("WZS", "P1")], "site string, plant string")
    out = {(r.category, str(r.period_start)): r for r in solar_staging(
        {"solar": solar, "plant_mapping": mapping}).collect()}
    assert out[("actual", "2023-02-01")].ytm_amount == 15.0
    assert out[("target", "2023-01-01")].ytm_amount == 20.0


def test_solar_remain_site_fanout(spark):
    remain = spark.createDataFrame(
        [("WKS/XTRKS", 100.0, J), ("WZS", 10.0, J)],
        "site string, amount double, period_start date")
    out = {r.site: r.amount for r in solar_remain_staging(
        {"solar_remain": remain}).collect()}
    assert out == {"WKS": 50.0, "XTRKS": 50.0, "WZS": 10.0}


def test_solar_other_melt(spark):
    other = spark.createDataFrame(
        [("WZS", J, 3.0, 7.0)],
        "site string, period_start date, tree double, fuel double")
    out = {r.category: r.amount for r in solar_other_staging(
        {"solar_other": other}).collect()}
    assert out == {"tree": 3.0, "fuel": 7.0}


def test_solar_info_period_stamp(spark):
    info = spark.createDataFrame(
        [("WZS", "P1", "capacity", 5.0)],
        "site string, plant string, category string, amount double")
    out = solar_info_staging({"solar_info": info},
                             run_date=dt.date(2023, 12, 1)).collect()[0]
    assert str(out.period_start) == "2023-11-01"


def test_renew_targets_projection(spark):
    cons = spark.createDataFrame(
        [("WZS", 2022, 900.0), ("WZS", 2023, 1000.0)],  # latest year wins
        "site string, year int, amount double")
    ratios = spark.createDataFrame(
        [(2024, 0.2), (2025, 0.5)], "year int, renewable_ratio double")
    coef = spark.createDataFrame(
        [("WZS", 2024, 0.5), ("WZS", 2025, 0.5)], "site string, year int, coef double")
    out = {r.year: r for r in renew_targets(
        {"consumption": cons, "ratio_path": ratios, "carbon_coef": coef},
        run_year=2024, horizon=1, base_year=2024).collect()}
    assert out[2024].target_renewable == pytest.approx(200.0)
    assert out[2024].scope2_target == pytest.approx(1000 * 0.8 * 0.5 / 1000)
    assert out[2025].scope2_target == pytest.approx(0.25)
    assert out[2024].pct_vs_base == pytest.approx(0.0)
    assert out[2025].pct_vs_base == pytest.approx((0.25 / 0.4 - 1) * 100)
    assert out[2025].pct_vs_prev == pytest.approx((0.25 / 0.4 - 1) * 100)
    assert out[2024].pct_vs_prev is None  # no previous year in window
