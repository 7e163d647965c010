from __future__ import annotations

import datetime as dt

import pytest

from esg_decarbonization_data_integration_and_data_pipline_spark.pipelines.green_transfer import (
    transfer_account,
)

P = dt.date(2023, 7, 1)


def test_transfer_account_reconciliation(spark):
    transfers = spark.createDataFrame(
        [("M1", "prov-a", 300.0, P), ("M2", "prov-a", 200.0, P),
         ("M3", "prov-b", 50.0, P), ("MX", "prov-a", 99.0, P)],  # unmapped meter
        "meter_code string, provider_name string, amount double, period_start date")
    meter_group = spark.createDataFrame(
        [("M1", "prov-a", 1), ("M2", "prov-a", 1), ("M3", "prov-b", 2)],
        "meter_code string, provider_name string, group_id int")
    group_mapping = spark.createDataFrame(
        [(1, "北區包"), (2, "南區包")], "group_id int, group_name string")
    contracts = spark.createDataFrame(
        [(1, "prov-a", P, 1000.0), (2, "prov-b", P, 40.0),
         (3, "prov-c", P, 10.0)],  # contract with no transfers yet
        "group_id int, provider_name string, period_start date, contract_amount double")
    out = {(r.group_id, r.provider_name): r for r in transfer_account(
        {"transfers": transfers, "meter_group": meter_group,
         "group_mapping": group_mapping, "contracts": contracts}).collect()}
    a = out[(1, "prov-a")]
    assert a.transferred == 500.0 and a.group_name == "北區包"
    assert a.fulfillment_rate == pytest.approx(0.5)
    assert a.remaining == 500.0
    b = out[(2, "prov-b")]
    assert b.fulfillment_rate == pytest.approx(1.25)
    assert b.remaining == 0.0  # over-fulfilled clamps at zero
    c = out[(3, "prov-c")]
    assert c.transferred == 0.0 and c.fulfillment_rate == 0.0
    assert (1, "prov-a") in out and len(out) == 3  # unmapped meter dropped
