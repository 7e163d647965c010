from __future__ import annotations

import datetime as dt

import pytest

from esg_decarbonization_data_integration_and_data_pipline_spark.pipelines.csr_replace import csr_replace
from esg_decarbonization_data_integration_and_data_pipline_spark.sources.connectors import excel_source

MAY, JUN = dt.date(2023, 5, 1), dt.date(2023, 6, 1)


def test_csr_values_win_locals_fill(spark):
    local = spark.createDataFrame(
        [("WZS", 10.0, MAY, "wzs_esgi"), ("WKS", 20.0, MAY, "wzs_esgi"),
         ("WZS", 11.0, JUN, "wzs_esgi"),
         ("OLD", 5.0, dt.date(2022, 1, 1), "wzs_esgi")],  # before window
        "site string, amount double, period_start date, type string")
    csr = spark.createDataFrame(
        [("WZS", 99.0, MAY), ("XTN", 7.0, JUN)],  # XTN: CSR-only site
        "site string, amount double, period_start date")
    out = {(r.site, str(r.period_start)): r for r in csr_replace(
        {"local": local, "csr": csr}, since=dt.date(2023, 1, 1)).collect()}
    assert out[("WZS", "2023-05-01")].amount == 99.0      # CSR wins
    assert out[("WZS", "2023-05-01")].type == "CSR"
    assert out[("WKS", "2023-05-01")].amount == 20.0      # local kept
    assert out[("WKS", "2023-05-01")].type == "wzs_esgi"
    assert out[("XTN", "2023-06-01")].amount == 7.0       # CSR-only row
    assert ("OLD", "2022-01-01") not in out               # outside window


def test_excel_source_gated_without_openpyxl(spark):
    """This container has no openpyxl; the source must fail loudly
    with the documented NotImplementedError, not a random crash."""
    try:
        import openpyxl  # noqa: F401
        pytest.skip("openpyxl present; gate not exercised")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="openpyxl"):
        excel_source(spark, "/nonexistent.xlsx")


def test_solar_csr_feed_normalizes_two_sources(spark):
    """csr_etl.py:122-201: recodes, second-feed pre-sum, period
    build, constant stamps; non-positive and null rows drop."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.pipelines.csr_replace import (
        solar_csr_feed,
    )
    view = spark.createDataFrame(
        [("WZS", 2024, 3, "太陽能發電量", 100.0),
         ("WZS", 2024, 3, "太陽能發電量", 0.0)],      # dropped
        "site string, year int, month int, category2 string, amount double")
    raw = spark.createDataFrame(
        [("WIHK1", 2024, 3, 40.0), ("WIHK1", 2024, 3, 2.0),
         ("WIHK2", 2024, 3, 8.0)],   # recoded to WIHK BEFORE the sum
        "site string, year int, month int, amount double")
    rows = {r.site: r for r in
            solar_csr_feed({"csr_view": view, "csr_raw": raw}).collect()}
    assert rows["WZS"].category2 == "光伏"            # recoded
    assert rows["WZS"].amount == 100.0
    assert rows["WIHK"].amount == 50.0                # recode, THEN sum
    assert rows["WIHK"].period_start.month == 3
    assert rows["WIHK"].category1 == "綠色能源"
    assert rows["WIHK"].type == "CSR" and rows["WIHK"].unit == "度"
    assert len(rows) == 2
