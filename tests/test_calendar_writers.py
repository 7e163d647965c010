"""Calendar rules (ported reference test cases) + writer policies."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from esg_decarbonization_data_integration_and_data_pipline_spark.functions.calendar import (
    last_12_months, period_year_window, processing_window,
)
from esg_decarbonization_data_integration_and_data_pipline_spark.io import writers as W


# reference: tests/helpers_decarb_date_test.py:10-36
def test_processing_window_normal():
    start, end = processing_window(dt.date(2023, 12, 1))
    assert start == dt.date(2023, 11, 1)
    assert end == dt.date(2023, 11, 30)


def test_processing_window_january_wraps():
    start, end = processing_window(dt.date(2023, 1, 1))
    assert start == dt.date(2022, 12, 1)
    assert end == dt.date(2022, 12, 31)


def test_period_year_window():
    start, end = period_year_window(dt.date(2024, 3, 15))
    assert start == dt.date(2023, 1, 1)
    assert end == dt.date(2024, 2, 29)  # leap-aware month end


def test_last_12_months():
    months = last_12_months(dt.date(2023, 2, 10))
    assert months[0] == dt.date(2023, 1, 1)
    assert months[-1] == dt.date(2022, 2, 1)
    assert len(set(months)) == 12


def _frame(spark, rows):
    return spark.createDataFrame(
        rows, "site string, amount double, period_month string")


def test_replace_range_touches_only_present_partitions(spark, tmp_path):
    path = os.path.join(str(tmp_path), "t")
    W.overwrite(_frame(spark, [("a", 1.0, "2023-01"), ("b", 2.0, "2023-02")]),
                path, ["period_month"])
    # rewrite only 2023-02; 2023-01 must survive
    W.replace_range(_frame(spark, [("b", 9.0, "2023-02")]),
                    path, ["period_month"])
    got = {(r.site, r.period_month): r.amount
           for r in W.read_table(spark, path).collect()}
    assert got == {("a", "2023-01"): 1.0, ("b", "2023-02"): 9.0}


def test_replace_keys_upserts(spark, tmp_path):
    path = os.path.join(str(tmp_path), "t")
    W.overwrite(_frame(spark, [("a", 1.0, "2023-01"), ("b", 2.0, "2023-01")]),
                path)
    W.replace_keys(_frame(spark, [("b", 5.0, "2023-01"), ("c", 7.0, "2023-01")]),
                   path, keys=["site", "period_month"])
    got = {r.site: r.amount for r in W.read_table(spark, path).collect()}
    assert got == {"a": 1.0, "b": 5.0, "c": 7.0}


def test_replace_keys_creates_missing_table(spark, tmp_path):
    path = os.path.join(str(tmp_path), "fresh")
    W.replace_keys(_frame(spark, [("a", 1.0, "2023-01")]), path,
                   keys=["site"])
    assert W.read_table(spark, path).count() == 1


def test_month_partitioned_column(spark):
    df = spark.createDataFrame([(dt.date(2023, 5, 1),)], "period_start date")
    out = W.month_partitioned(df).collect()[0]
    assert out.period_month == "2023-05"
