"""Next-year transfer suggestion: gap formula + per-site greedy fill
(inferred job, main.py:2-3/110; see pipelines/transfer_suggest.py)."""

from __future__ import annotations

import pytest

from esg_decarbonization_data_integration_and_data_pipline_spark.pipelines.transfer_suggest import (
    next_year_transfer_suggest, transfer_gaps,
)


def _tables(spark):
    return {
        "consumption": spark.createDataFrame(
            [("WZS", 2023, 900.0), ("WZS", 2024, 1000.0),
             ("WKS", 2024, 200.0)],
            "site string, year int, amount double"),
        "ratio_path": spark.createDataFrame(
            [(2024, 0.3), (2025, 0.4)],
            "year int, renewable_ratio double"),
        "secured": spark.createDataFrame(
            [("WZS", 100.0), ("WZS", 50.0), ("WKS", 500.0)],
            "site string, green_kwh double"),
        "offers": spark.createDataFrame(
            [("WZS", "ppa-a", 3.0, 120.0),
             ("WZS", "ppa-b", 2.5, 100.0),
             ("WKS", "ppa-c", 2.0, 50.0)],
            "site string, source_id string, price double, available double"),
    }


def test_transfer_gaps_latest_year_and_clamp(spark):
    gaps = {r.site: r for r in transfer_gaps(_tables(spark), 2025).collect()}
    w = gaps["WZS"]
    # latest actual (2024: 1000) x next-year rate 0.4 - secured 150
    assert w.base_amount == 1000.0 and w.target_rate == 0.4
    assert w.target_amount == pytest.approx(250.0)
    # over-secured site clamps at zero
    assert gaps["WKS"].target_amount == 0.0


def test_suggest_fills_cheapest_first(spark):
    out = {(r.site, r.source_id): r for r in
           next_year_transfer_suggest(_tables(spark), 2025).collect()}
    b = out[("WZS", "ppa-b")]          # cheaper offer ranks first
    assert b.rank == 1 and b.allocated == 100.0
    a = out[("WZS", "ppa-a")]
    # remaining 150 capped by the offer's 120 availability
    assert a.rank == 2 and a.allocated == pytest.approx(120.0)
    assert a.unfilled == pytest.approx(30.0)   # 250 - (100 + 120)
    c = out[("WKS", "ppa-c")]
    assert c.allocated == 0.0          # no shortfall, nothing suggested


def test_suggest_surfaces_offerless_shortfall_and_missing_rate(spark):
    tables = _tables(spark)
    # WNH has demand but NO offer rows: must surface as one row with
    # null source and the full gap unfilled
    tables["consumption"] = tables["consumption"].union(
        spark.createDataFrame([("WNH", 2024, 500.0)],
                              tables["consumption"].schema))
    out = {r.site: r for r in
           next_year_transfer_suggest(tables, 2025).collect()
           if r.site == "WNH"}
    assert out["WNH"].source_id is None
    assert out["WNH"].unfilled == pytest.approx(200.0)   # 500 x 0.4
    # a year missing from ratio_path -> rate 0, sites stay visible
    # with zero targets instead of an empty result
    rows = next_year_transfer_suggest(tables, 2099).collect()
    assert {r.site for r in rows} == {"WZS", "WKS", "WNH"}
    assert all(r.target_amount == 0.0 for r in rows)
