"""End-to-end DAG: ingest -> raw -> staging -> app over a real
parquet warehouse, twice (idempotency), with dependency ordering."""

from __future__ import annotations

import datetime as dt
import os

import pytest

from esg_decarbonization_data_integration_and_data_pipline_spark.io import writers as W
from esg_decarbonization_data_integration_and_data_pipline_spark.pipelines.warehouse_dag import (
    build_warehouse_dag,
)

RUN = dt.date(2023, 12, 1)


@pytest.fixture()
def sources(spark):
    esgi = spark.createDataFrame(
        [("總用電度數", "P1", dt.date(2023, 5, 1), "1.0", 1),
         ("總用電度數", "P2", dt.date(2023, 5, 1), "2.0", 2),
         ("綠電電量", "P1", dt.date(2023, 5, 1), "0.1", 3)],
        "data_name string, plant string, period_start date, data_value string, "
        "performance_goalsid int")
    mapping = spark.createDataFrame(
        [("WZS", "P1", "BO1"), ("WKS", "P2", "BO1")],
        "site string, plant string, bo string")
    solar = spark.createDataFrame(
        [("WZS", 100.0, dt.date(2023, 5, 1))],
        "site string, amount double, period_start date")
    green = spark.createDataFrame(
        [("WZS", 200.0, dt.date(2023, 5, 1))],
        "site string, amount double, period_start date")
    coef = spark.createDataFrame(
        [("WZS", 2023, 0.5), ("WKS", 2023, 0.5)],
        "site string, year int, coef double")
    return {"esgi_indicators": esgi, "plant_mapping": mapping,
            "solar": solar, "green": green, "carbon_coef": coef}


def test_dag_end_to_end_and_idempotent(spark, sources, tmp_path):
    wh = str(tmp_path / "warehouse")
    reg = build_warehouse_dag(wh, sources, base_year=2023)
    results = reg.run_all(spark, RUN)
    assert results == {"esgi_to_raw": "ok", "electricity_decarb": "ok",
                       "scope_overview": "ok"}

    app = W.read_table(spark, os.path.join(wh, "app.db", "decarb_elec_overview"))
    rows = {r.site: r for r in app.collect()}
    # WZS: esgi 1.0x1000 + solar 100 = 1100 total
    assert rows["WZS"].total == pytest.approx(1100.0)
    assert rows["WZS"].scope2_location == pytest.approx(1100 * 0.5 / 1000)
    # market: total - green(200) - solar(100)
    assert rows["WZS"].scope2_market == pytest.approx(800 * 0.5 / 1000)
    assert rows["WKS"].total == pytest.approx(2000.0)

    # rerun the whole DAG: warehouse must be byte-identical in rows
    before = sorted(map(tuple, app.collect()))
    assert reg.run_all(spark, RUN)["scope_overview"] == "ok"
    after = sorted(map(tuple, W.read_table(
        spark, os.path.join(wh, "app.db", "decarb_elec_overview")).collect()))
    assert before == after
