from __future__ import annotations

import pytest

from esg_decarbonization_data_integration_and_data_pipline_spark.pipelines.green_energy import (
    customer_green_energy, green_energy_amount, renew_total,
)


def test_renew_total_request_clamps_at_zero(spark):
    tables = {
        "elect": spark.createDataFrame(
            [("AAA", 2024, 1000.0), ("BBB", 2024, 100.0)],
            "site string, year int, total_elect double"),
        "solar": spark.createDataFrame([("AAA", 100.0), ("BBB", 90.0)],
                                       "site string, solar double"),
        "green_elect": spark.createDataFrame([("AAA", 200.0)],
                                             "site string, green_elect double"),
        "green_energy": spark.createDataFrame([("AAA", 50.0)],
                                              "site string, green_energy double"),
        "renew_target": spark.createDataFrame([(2024, 0.4)],
                                              "year int, target_rate double"),
    }
    rows = {r.site: r for r in renew_total(tables).collect()}
    a = rows["AAA"]
    assert a.target_renew == pytest.approx(400.0)
    assert a.grey_elect == pytest.approx(700.0)
    # request = 400 - 100 - 200 - 50 = 50
    assert a.green_energy_request == pytest.approx(50.0)
    b = rows["BBB"]
    # target 40 < solar 90 -> clamps at zero, missing joins fill 0
    assert b.green_energy_request == 0.0
    assert b.grey_elect == pytest.approx(10.0)


def _tables(spark):
    cust_cols = ("year int, quarter int, area string, site string, "
                 "customer string, total_elect double, target_renew double, "
                 "solar double, green_elect double, grey_elect double, "
                 "green_energy double, predict_price double, "
                 "green_energy_request double, actual_amount double")
    return {
        "elect_src": spark.createDataFrame([("AAA", 1200.0), ("BBB", 100.0)],
                                           "site string, total_elect double"),
        "solar_src": spark.createDataFrame([("AAA", 100.0)],
                                           "site string, solar double"),
        "green_elect_src": spark.createDataFrame([("AAA", 200.0)],
                                                 "site string, green_elect double"),
        "green_energy_src": spark.createDataFrame([("AAA", 50.0)],
                                                  "site string, green_energy double"),
        "customer_rows": spark.createDataFrame(
            [(2024, 2, "台灣", "AAA", "ACME", 200.0, 80.0, 0.0, 0.0, 200.0,
              20.0, 10.0, 30.0, 5.0)], cust_cols),
        "renew_target": spark.createDataFrame([(2024, 0.4)],
                                              "year int, target_rate double"),
        "unit_price": spark.createDataFrame(
            [("AAA", 2.0, 7.0)],
            "site string, unit_price double, actual_amount double"),
        "area_mapping": spark.createDataFrame(
            [("AAA", "台灣"), ("AAA", "台灣")],  # duplicate row collapses
            "site string, area string"),
        "remarks": spark.createDataFrame(
            [(2024, 2, "台灣", "ALL", "ALL", "rolled"),
             (2024, 2, "台灣", "AAA", "", "note-a")],
            "year int, quarter int, area string, site string, "
            "customer string, remark string"),
    }


def test_green_energy_amount_assembly(spark):
    rows = green_energy_amount(_tables(spark), 2024, 2).collect()
    by_key = {(r.site, r.customer, r.area): r for r in rows}

    a = by_key[("AAA", "", "台灣")]
    # customer slice subtracted before targets: 1200-200=1000 elect
    assert a.total_elect == 1000.0
    assert a.target_renew == pytest.approx(400.0)
    assert a.green_energy_request == pytest.approx(50.0)
    assert a.predict_price == pytest.approx(100.0)   # 2.0 x 50
    assert a.ratio == pytest.approx(5.0)             # 50/1000 x 100
    assert a.remark == "note-a"

    b = by_key[("BBB", "", "其他")]
    assert b.total_elect == 100.0

    c = by_key[("AAA", "ACME", "台灣")]                      # customer row kept
    assert c.total_elect == 200.0 and c.green_energy == 20.0

    # area rollup sums site + customer rows, recomputes ratio
    r = by_key[("ALL", "ALL", "台灣")]
    assert r.total_elect == 1200.0
    assert r.green_energy == 70.0
    assert r.ratio == pytest.approx(70.0 / 1200.0 * 100)
    assert r.remark == "rolled"
    assert len(rows) == 5  # 2 site rows + 1 customer + 2 area rollups


def test_customer_green_energy_reprices_slice(spark):
    """add_customer_data branch: green_energy forced to 0, request =
    max(0, target - solar - green_elect), per-customer unit price on
    (site, year, customer), missing price fills 0."""
    tables = {
        "customer_rows": spark.createDataFrame(
            [(2024, 2, "台灣", "AAA", "ACME", 500.0, 20.0, 30.0),
             (2024, 2, "台灣", "AAA", "Zeta", 100.0, 5.0, 0.0),
             (2024, 1, "台灣", "AAA", "ACME", 999.0, 9.0, 9.0),
             (2024, 2, "台灣", "BBB", "Other", 100.0, 0.0, 0.0)],
            "year int, quarter int, area string, site string, "
            "customer string, total_elect double, solar double, "
            "green_elect double"),
        "renew_target": spark.createDataFrame([(2024, 0.4)],
                                              "year int, target_rate double"),
        "unit_price": spark.createDataFrame(
            [("AAA", 2024, "ACME", 3.0, 9.0)],
            "site string, year int, customer string, unit_price double, "
            "actual_amount double"),
        "remarks": spark.createDataFrame(
            [(2024, 2, "台灣", "AAA", "ACME", "reserved")],
            "year int, quarter int, area string, site string, "
            "customer string, remark string"),
    }
    rows = {r.customer: r for r in
            customer_green_energy(tables, 2024, 2).collect()}
    a = rows["ACME"]
    assert a.green_energy == 0.0                       # forced to zero
    assert a.target_renew == pytest.approx(200.0)      # 500 x 0.4
    # request = 200 - 20 - 30 - 0 = 150; predict = 3.0 x 150
    assert a.green_energy_request == pytest.approx(150.0)
    assert a.predict_price == pytest.approx(450.0)
    assert a.ratio == 0.0                              # 0 / 500 x 100
    assert a.remark == "reserved"
    b = rows["Other"]                                  # no price row
    assert b.unit_price == 0.0 and b.predict_price == 0.0
    assert b.remark is None
    # two customers on ONE site stay per-customer rows (the
    # reference's site-keyed merges would cross-product them) and
    # the off-quarter row is sliced out
    z = rows["Zeta"]
    assert z.total_elect == 100.0
    assert z.green_energy_request == pytest.approx(100.0 * 0.4 - 5.0)
    assert len(rows) == 3


def test_target_adjust_subtracts_filter_slice(spark):
    import datetime as dt

    from esg_decarbonization_data_integration_and_data_pipline_spark.pipelines.green_energy import target_adjust

    all_rows = spark.createDataFrame(
        [(dt.date(2024, 1, 1), 5.0, 100.0), (dt.date(2024, 2, 1), 6.0, 160.0)],
        "period_start date, amount double, ytm_amount double")
    filt = spark.createDataFrame([(60.0,)], "amount double")
    out = {r.period_start.month: r for r in
           target_adjust(all_rows, filt).collect()}
    assert out[1].amount == 40.0 and out[1].ytm_amount == 100.0
    assert out[2].amount == 100.0
    # empty filter slice: amount = ytm unchanged (reference's
    # size-zero branch)
    empty = spark.createDataFrame([], "amount double")
    out2 = {r.period_start.month: r.amount for r in
            target_adjust(all_rows, empty).collect()}
    assert out2 == {1: 100.0, 2: 160.0}
