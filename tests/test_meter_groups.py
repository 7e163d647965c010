"""Meter-group packaging vs the reference's pandas construction
(jobs/staging_to_app.py:282-342): grouped meters roll up into a
synthetic group meter, green_rate = green / grey per group, original
rows preserved."""

from __future__ import annotations

import pytest

from esg_decarbonization_data_integration_and_data_pipline_spark.pipelines.meter_groups import (
    build_meter_groups, group_green_rate, pack_meter_groups,
    packaged_accounts,
)

ACCT_SCHEMA = ("site string, plant string, meter_code string, "
               "provider_name string, category1 string, category2 string, "
               "amount double, year int, month int, area string")


def _accounts(spark):
    rows = [
        # two meters in group G1 (both green and grey rows)
        ("WZS", "WZS-1", "M1", "prov", "green_elect_vol", "volume",
         30.0, 2023, 1, "cn"),
        ("WZS", "WZS-1", "M2", "prov", "green_elect_vol", "volume",
         10.0, 2023, 1, "cn"),
        ("WZS", "WZS-1", "M1", "prov", "grey_elect", "volume",
         60.0, 2023, 1, "cn"),
        ("WZS", "WZS-1", "M2", "prov", "grey_elect", "volume",
         20.0, 2023, 1, "cn"),
        # billing rows are excluded from the rate but kept in rollup
        ("WZS", "WZS-1", "M1", "prov", "green_elect_vol", "elect_bill",
         99.0, 2023, 1, "cn"),
        # a category outside green/grey never rolls up
        ("WZS", "WZS-1", "M1", "prov", "other_cat", "volume",
         5.0, 2023, 1, "cn"),
        # an ungrouped meter
        ("WKS", "WKS-5", "M9", "prov", "green_elect_vol", "volume",
         7.0, 2023, 1, "cn"),
    ]
    return spark.createDataFrame(rows, ACCT_SCHEMA)


def _groups(spark):
    mg = spark.createDataFrame(
        [("M1", 1), ("M2", 1), ("M3", None)],
        "meter_code string, group_id int")
    mapping = spark.createDataFrame([(1, "G1_ALL")],
                                    "group_id int, group_name string")
    return mg, mapping


def test_build_meter_groups_drops_ungrouped(spark):
    mg, mapping = _groups(spark)
    got = {r.meter_code: r.group_name
           for r in build_meter_groups(mg, mapping).collect()}
    assert got == {"M1": "G1_ALL", "M2": "G1_ALL"}  # M3 dropped (null id)


def test_pack_rolls_up_to_group_meter(spark):
    mg, mapping = _groups(spark)
    packed = pack_meter_groups(_accounts(spark),
                               build_meter_groups(mg, mapping))
    got = {(r.meter_code, r.category1, r.category2): r.amount
           for r in packed.collect()}
    assert got[("G1_ALL", "green_elect_vol", "volume")] == 40.0  # 30+10
    assert got[("G1_ALL", "grey_elect", "volume")] == 80.0       # 60+20
    assert got[("G1_ALL", "green_elect_vol", "elect_bill")] == 99.0
    # other_cat and the ungrouped M9 never appear
    assert all(k[0] == "G1_ALL" for k in got)
    assert not any(k[1] == "other_cat" for k in got)


def test_group_green_rate_green_over_grey(spark):
    mg, mapping = _groups(spark)
    packed = pack_meter_groups(_accounts(spark),
                               build_meter_groups(mg, mapping))
    rates = group_green_rate(packed).collect()
    assert len(rates) == 1          # elect_bill rows excluded
    r = rates[0]
    assert r.category1 == "green_rate" and r.meter_code == "G1_ALL"
    assert r.amount == pytest.approx(40.0 / 80.0)


def test_packaged_accounts_keeps_all_layers(spark):
    mg, mapping = _groups(spark)
    out = packaged_accounts(_accounts(spark), mg, mapping).collect()
    # 7 original + 3 group rollups + 1 rate row
    assert len(out) == 11
    by_cat = {}
    for r in out:
        by_cat.setdefault(r.category1, 0)
        by_cat[r.category1] += 1
    assert by_cat["green_rate"] == 1
    # the ungrouped meter's original row survives untouched
    assert any(r.meter_code == "M9" and r.amount == 7.0 for r in out)


def test_unmapped_group_is_dropped(spark):
    """Review fix: a group_id with no mapping row never becomes a
    NULL-named synthetic meter (pandas groupby drops NaN keys; we do
    it explicitly)."""
    mg = spark.createDataFrame([("M1", 1), ("M5", 9)],
                               "meter_code string, group_id int")
    mapping = spark.createDataFrame([(1, "G1_ALL")],
                                    "group_id int, group_name string")
    got = {r.meter_code: r.group_name
           for r in build_meter_groups(mg, mapping).collect()}
    assert got == {"M1": "G1_ALL"}
