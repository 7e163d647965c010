from __future__ import annotations

import datetime as dt

from esg_decarbonization_data_integration_and_data_pipline_spark.pipelines.source_status import (
    seed_current_month, source_status, status_window,
)


def test_status_window_branches():
    jan = status_window(dt.date(2024, 1, 15))
    assert (jan["year"], jan["month_end"]) == (2023, 12)
    assert (jan["year_last"], jan["month_last"]) == (2023, 11)
    feb = status_window(dt.date(2024, 2, 1))
    assert (feb["year"], feb["month_end"]) == (2024, 1)
    assert (feb["year_last"], feb["month_last"]) == (2023, 12)
    jul = status_window(dt.date(2024, 7, 1))
    assert (jul["year"], jul["month_start"], jul["month_end"]) == (2024, 1, 6)
    assert (jul["year_last"], jul["month_last"]) == (2024, 5)
    assert jul["period_year_end"] == dt.date(2024, 6, 1)


def _tables(spark):
    electricity = spark.createDataFrame(
        [("AAA", dt.date(2024, 5, 1), "CSR"),
         ("AAA", dt.date(2024, 5, 1), "CSR"),        # duplicate collapses
         ("BBB", dt.date(2024, 6, 1), "wzs_esgi"),
         ("AAA", dt.date(2024, 7, 1), "CSR"),        # beyond window
         ("CCC", dt.date(2024, 5, 1), "")],          # unlanded type
        "site string, period_start date, type string")
    renewable = spark.createDataFrame(
        [("AAA", "光伏", dt.date(2024, 5, 1), "CSR"),
         ("BBB", "綠電", dt.date(2024, 6, 1), "wzs_esgi")],
        "site string, category2 string, period_start date, type string")
    plant_mapping = spark.createDataFrame(
        [("FAB", "AAA"), ("FAB", "BBB"), ("OFFICE", "CCC")],
        "site_category string, site string")
    confirm = spark.createDataFrame(
        [("FAB", "AAA", "實際用電", 2024, 5, True),
         ("FAB", "AAA", "自建太陽能", 2024, 5, False),
         ("FAB", "BBB", "實際用電", 2024, 6, False),
         ("FAB", "BBB", "直購綠電", 2024, 6, False),
         ("FAB", "AAA", "實際用電", 2024, 6, False),   # nothing landed
         ("FAB", "AAA", "實際用電", 2023, 12, True)],  # outside window
        "site_category string, site string, item string, year int, "
        "month int, confirm boolean")
    return {"electricity": electricity, "renewable": renewable,
            "plant_mapping": plant_mapping, "confirm": confirm}


def test_source_status_merge(spark):
    rows = source_status(_tables(spark), dt.date(2024, 7, 2)).collect()
    by_key = {(r.site, r.item, r.month): r for r in rows}

    # landed types recoded; confirm checkbox preserved
    assert by_key[("AAA", "實際用電", 5)].type == "ESG Database"
    assert by_key[("AAA", "實際用電", 5)].confirm is True
    assert by_key[("AAA", "自建太陽能", 5)].type == "ESG Database"
    assert by_key[("BBB", "實際用電", 6)].type == "ESGI"
    assert by_key[("BBB", "直購綠電", 6)].type == "ESGI"
    # confirm row with nothing landed keeps a null type
    assert by_key[("AAA", "實際用電", 6)].type is None
    # window: 2023-12 row excluded; dedup means one row per confirm row
    assert (("AAA", "實際用電", 12)) not in by_key
    assert len(rows) == 5


def test_seed_current_month(spark):
    seeded = seed_current_month(_tables(spark)["confirm"],
                                dt.date(2024, 7, 1)).collect()
    # seed copies (2024, 5) rows to (2024, 6) with type cleared
    assert {(r.site, r.item) for r in seeded} == {
        ("AAA", "實際用電"), ("AAA", "自建太陽能")}
    assert all(r.year == 2024 and r.month == 6 and r.type == ""
               for r in seeded)
    assert {r.confirm for r in seeded} == {True, False}
