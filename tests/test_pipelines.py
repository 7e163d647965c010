"""Golden tests for the reference-pipeline replicas over FIXTURES.md-
shaped fixtures, cross-checked against DuckDB where the semantics are
SQL-expressible."""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest
from pyspark.sql import functions as F

from esg_decarbonization_data_integration_and_data_pipline_spark.pipelines.allocator import greedy_allocate
from esg_decarbonization_data_integration_and_data_pipline_spark.pipelines.electricity_decarb import (
    electricity_decarb,
)
from esg_decarbonization_data_integration_and_data_pipline_spark.pipelines.fem_ratio import fem_ratio
from esg_decarbonization_data_integration_and_data_pipline_spark.pipelines.scope_overview import (
    scope_overview,
)
from esg_decarbonization_data_integration_and_data_pipline_spark.pipelines.tariff_reconciliation import (
    price_bills,
)

RUN = dt.date(2023, 12, 1)  # processing month 2023-11


def test_fem_ratio_end_to_end(spark):
    daily = spark.createDataFrame(
        [("WZS", "P1", dt.date(2023, 11, 3), 30.0, "用電量"),
         ("WZS", "P1", dt.date(2023, 11, 4), 30.0, "用電量"),
         ("WZS", "P2", dt.date(2023, 11, 3), 40.0, "用電量"),
         ("WZS", "P2", dt.date(2023, 11, 3), 40.0, "其他"),     # wrong measure
         ("WZS", "P3", dt.date(2023, 10, 9), 99.0, "用電量"),   # out of window
         ("WZS", "PX", dt.date(2023, 11, 5), 10.0, "用電量")],  # unmapped plant
        "site string, plant_code string, datadate date, power double, consumetype string")
    mapping = spark.createDataFrame(
        [("WZS", "Plant-1", "P1"), ("WZS", "Plant-2", "P2"), ("WZS", "Plant-3", "P3")],
        "site string, plant_name string, plant_code string")
    out = {r.plant: r for r in
           fem_ratio({"fem_dailypower": daily, "plant_mapping": mapping},
                     RUN).collect()}
    # output plant labels are plant NAMES (reference fem_ratio.py:13
    # aliases plant_name AS plant and groups on it)
    assert set(out) == {"Plant-1", "Plant-2"}
    assert out["Plant-1"].amount == 60.0 and out["Plant-2"].amount == 40.0
    assert out["Plant-1"].ratio == pytest.approx(0.6)
    assert out["Plant-2"].ratio == pytest.approx(0.4)
    assert str(out["Plant-1"].period_start) == "2023-11-01"
    assert out["Plant-1"].category == "plant"


def test_electricity_decarb_ytm_and_rollup(spark):
    elec = spark.createDataFrame(
        [("WZS", 100.0, dt.date(2023, 1, 1)), ("WZS", 50.0, dt.date(2023, 2, 1)),
         ("WKS", 10.0, dt.date(2023, 1, 1))],
        "site string, amount double, period_start date")
    solar = spark.createDataFrame(
        [("WZS", 5.0, dt.date(2023, 2, 1)),
         ("XTN", 7.0, dt.date(2023, 1, 1))],  # solar-only site
        "site string, amount double, period_start date")
    mapping = spark.createDataFrame(
        [("WZS", "BO1"), ("WKS", "BO1"), ("XTN", "BO2")], "site string, bo string")
    out = electricity_decarb(
        {"electricity_total": elec, "solar": solar, "plant_mapping": mapping},
        RUN)
    rows = {(r.bo, r.site, str(r.period_start)): (r.amount, r.ytm_amount)
            for r in out.collect()}
    # detail: WZS Feb = 50 + 5 solar, YTM = 100 + 55
    assert rows[("BO1", "WZS", "2023-02-01")] == (55.0, 155.0)
    # solar-only site flows through the outer join
    assert rows[("BO2", "XTN", "2023-01-01")] == (7.0, 7.0)
    # site rollup within BO1, Jan = 100 + 10
    assert rows[("BO1", "ALL", "2023-01-01")] == (110.0, 110.0)
    # grand total Jan = 100 + 10 + 7
    assert rows[("ALL", "ALL", "2023-01-01")] == (117.0, 117.0)
    assert out.columns == ["bo", "site", "amount", "ytm_amount",
                           "period_start", "unit"]


def test_tariff_asof_and_summer_band(spark):
    bills = spark.createDataFrame(
        [("WZS", "M1", "經常尖峰", 100.0, dt.date(2023, 7, 1), "north"),
         ("WZS", "M1", "經常尖峰", 100.0, dt.date(2023, 11, 1), "north"),
         ("WZS", "M2", "離峰", 10.0, dt.date(2023, 7, 1), "south")],
        "site string, meter_code string, category2 string, amount double, "
        "period_start date, area string")
    base = spark.createDataFrame(
        [(1, "north", dt.date(2023, 1, 1), 6, 9),   # superseded
         (2, "north", dt.date(2023, 6, 1), 6, 9),   # active from June
         (3, "south", dt.date(2023, 1, 1), 7, 8)],
        "base_id int, area string, guideline_date date, "
        "summer_start_month int, summer_end_month int")
    meter = spark.createDataFrame(
        [(2, "經常尖峰", 5.0, True), (2, "經常尖峰", 3.0, False),
         (3, "離峰", 1.5, True), (3, "離峰", 1.0, False)],
        "base_id int, category string, price double, is_summer boolean")
    out = {(r.meter_code, str(r.period_start)): r for r in
           price_bills({"bills": bills, "bill_base": base,
                        "bill_meter": meter}).collect()}
    jul = out[("M1", "2023-07-01")]
    assert jul.base_id == 2 and jul.is_summer is True and jul.cost == 500.0
    nov = out[("M1", "2023-11-01")]
    assert nov.is_summer is False and nov.cost == 300.0
    south = out[("M2", "2023-07-01")]
    assert south.base_id == 3 and south.cost == 15.0


def test_scope_overview_formulas(spark):
    elec = spark.createDataFrame(
        [("WZS", 1000.0, dt.date(2022, 3, 1)), ("WZS", 2000.0, dt.date(2023, 3, 1))],
        "site string, amount double, period_start date")
    green = spark.createDataFrame(
        [("WZS", 500.0, dt.date(2023, 4, 1))],
        "site string, amount double, period_start date")
    solar = spark.createDataFrame(
        [("WZS", 100.0, dt.date(2023, 5, 1))],
        "site string, amount double, period_start date")
    coef = spark.createDataFrame(
        [("WZS", 2022, 0.5), ("WZS", 2023, 0.5)], "site string, year int, coef double")
    out = {r.year: r for r in scope_overview(
        {"elect_total": elec, "green": green, "solar": solar,
         "carbon_coef": coef}, base_year=2022).collect()}
    assert out[2023].scope2_location == pytest.approx(1.0)       # 2000*0.5/1000
    assert out[2023].scope2_market == pytest.approx(0.7)         # 1400*0.5/1000
    assert out[2022].scope1 == pytest.approx(0.5 * 0.06 / 0.94, abs=1e-6)
    assert out[2023].renewable_ratio == pytest.approx(0.3)
    assert out[2023].pct_vs_base == pytest.approx((0.7 / 0.5 - 1) * 100)


def test_greedy_allocator_matches_sequential_oracle(spark):
    offers = spark.createDataFrame(
        [(2030, "ppa_a", 4.0, 500.0), (2030, "ppa_b", 3.0, 400.0),
         (2030, "rec_c", 5.0, 1000.0), (2031, "ppa_a", 4.0, 100.0)],
        "year int, source_id string, price double, available double")
    targets = spark.createDataFrame(
        [(2030, 1100.0), (2031, 500.0)], "year int, target_amount double")
    out = {(r.year, r.source_id): r for r in
           greedy_allocate(offers, targets).collect()}
    # cheapest-first: b(400) -> a(500) -> c(200 of 1000)
    assert out[(2030, "ppa_b")].rank == 1
    assert out[(2030, "ppa_b")].allocated == 400.0
    assert out[(2030, "ppa_a")].allocated == 500.0
    assert out[(2030, "rec_c")].allocated == 200.0
    assert out[(2030, "rec_c")].cum_allocated == 1100.0
    # 2031 capped by availability
    assert out[(2031, "ppa_a")].allocated == 100.0


def test_greedy_allocator_lot_flooring(spark):
    offers = spark.createDataFrame(
        [(2030, "rec_a", 3.0, 2500.0)], "year int, source_id string, price double, available double")
    targets = spark.createDataFrame([(2030, 2500.0)], "year int, target_amount double")
    out = greedy_allocate(offers, targets, lot_size=1000.0).collect()[0]
    assert out.allocated == 2000.0  # floored to whole 1000-lots


def test_electricity_decarb_matches_duckdb(spark):
    """Cross-engine golden check of the full YTM+rollup pipeline."""
    elec_rows = [("WZS", 100.0, dt.date(2023, 1, 1)),
                 ("WZS", 50.0, dt.date(2023, 2, 1)),
                 ("WKS", 10.0, dt.date(2023, 1, 1))]
    solar_rows = [("WZS", 5.0, dt.date(2023, 2, 1))]
    elec = spark.createDataFrame(elec_rows, "site string, amount double, period_start date")
    solar = spark.createDataFrame(solar_rows, "site string, amount double, period_start date")
    mapping = spark.createDataFrame([("WZS", "BO1"), ("WKS", "BO1")],
                                    "site string, bo string")
    got = {(r.bo, r.site, str(r.period_start)): (r.amount, r.ytm_amount)
           for r in electricity_decarb(
               {"electricity_total": elec, "solar": solar,
                "plant_mapping": mapping}, RUN).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE elec(site VARCHAR, amount DOUBLE, period_start DATE)")
    con.executemany("INSERT INTO elec VALUES (?, ?, ?)", elec_rows)
    con.execute("CREATE TABLE solar(site VARCHAR, amount DOUBLE, period_start DATE)")
    con.executemany("INSERT INTO solar VALUES (?, ?, ?)", solar_rows)
    con.execute("CREATE TABLE mapping(site VARCHAR, bo VARCHAR)")
    con.executemany("INSERT INTO mapping VALUES (?, ?)", [("WZS", "BO1"), ("WKS", "BO1")])
    oracle = con.execute("""
        WITH combined AS (
          SELECT coalesce(e.site, s.site) AS site,
                 coalesce(e.period_start, s.period_start) AS period_start,
                 coalesce(e.amount, 0) + coalesce(s.amount, 0) AS amount
          FROM (SELECT site, period_start, sum(amount) AS amount FROM elec GROUP BY 1,2) e
          FULL OUTER JOIN (SELECT site, period_start, sum(amount) AS amount FROM solar GROUP BY 1,2) s
            ON e.site = s.site AND e.period_start = s.period_start
        ),
        withbo AS (SELECT coalesce(m.bo, 'ALL') AS bo, b.* FROM combined b LEFT JOIN mapping m USING (site)),
        ytm AS (SELECT *, sum(amount) OVER (PARTITION BY bo, site, year(period_start)
                                            ORDER BY period_start
                                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ytm_amount
                FROM withbo)
        SELECT CASE WHEN GROUPING(bo)=1 THEN 'ALL' ELSE bo END AS bo,
               CASE WHEN GROUPING(site)=1 THEN 'ALL' ELSE site END AS site,
               period_start, sum(amount) AS amount, sum(ytm_amount) AS ytm_amount
        FROM ytm GROUP BY GROUPING SETS ((bo, site, period_start), (bo, period_start), (period_start))
    """).fetchall()
    want = {(r[0], r[1], str(r[2])): (r[3], r[4]) for r in oracle}
    assert got == want


def test_scope_pct_change_cross_and_per_period(spark):
    """staging_cal.py:175-246: ((cur/base)-1)*100 on amount and
    ytm_amount; scalar base via cross join, _fix variant per period;
    zero base -> NULL."""
    import datetime as dt

    from esg_decarbonization_data_integration_and_data_pipline_spark.pipelines.scope_overview import (
        decarb_simulate_current_year, scope_pct_change,
    )
    stamp = dt.date(2024, 6, 1)
    cur = spark.createDataFrame(
        [(dt.date(2024, 5, 1), 110.0, 220.0),
         (dt.date(2024, 6, 1), 130.0, 350.0)],
        "period_start date, amount double, ytm_amount double")
    base = spark.createDataFrame([(100.0, 200.0)],
                                 "amount double, ytm_amount double")
    rows = scope_pct_change(cur, base, stamp).collect()
    assert {round(r.amount, 6) for r in rows} == {10.0, 30.0}
    assert all(r.period_start == stamp for r in rows)

    per = spark.createDataFrame(
        [(dt.date(2024, 5, 1), 100.0, 200.0),
         (dt.date(2024, 6, 1), 0.0, 175.0)],   # zero base -> NULL
        "period_start date, amount double, ytm_amount double")
    fix = {r.ytm_amount: r for r in
           scope_pct_change(cur, per, stamp, per_period=True).collect()}
    assert round(min(fix), 6) == 10.0          # 220/200
    assert fix[100.0].amount is None           # 130/0 -> NULL

    prev = spark.createDataFrame([(120.0, 240.0)],
                                 "amount double, ytm_amount double")
    s2, s12, sbti = decarb_simulate_current_year(
        cur, base, cur, base, prev, stamp, per_period=False)
    assert s2.count() == 2 and s12.count() == 2 and sbti.count() == 2

    # per-period SBTi leg aligns on MONTH: the previous-year frame
    # keeps its own year's dates and must still match
    prev_year = spark.createDataFrame(
        [(dt.date(2023, 5, 1), 100.0, 200.0),
         (dt.date(2023, 6, 1), 100.0, 175.0)],
        "period_start date, amount double, ytm_amount double")
    _, _, sbti_pp = decarb_simulate_current_year(
        cur, per, cur, per, prev_year, stamp, per_period=True)
    vals = sorted(round(r.amount, 6) for r in sbti_pp.collect())
    assert vals == [10.0, 30.0]        # 110/100, 130/100 by month


def test_monthly_scope_series_and_s1n2(spark):
    """staging_cal.py:41-108: per-site netting x coef/1000 summed per
    period; scope1 = location x 0.06/0.94; s1n2 = s1 + market."""
    import datetime as dt

    from esg_decarbonization_data_integration_and_data_pipline_spark.pipelines.scope_overview import (
        SCOPE1_FACTOR, s1_and_s1n2, s2_series,
    )
    may = dt.date(2024, 5, 1)
    elect = spark.createDataFrame(
        [("WZS", may, 1000.0, 5000.0), ("WKS", may, 400.0, 2000.0)],
        "site string, period_start date, amount double, ytm_amount double")
    green = spark.createDataFrame(
        [("WZS", may, 200.0, 800.0)],   # WKS has no green row -> 0
        "site string, period_start date, amount double, ytm_amount double")
    coef = spark.createDataFrame([("WZS", 0.5), ("WKS", 0.4)],
                                 "site string, coef double")
    market = s2_series(elect, green, coef)
    m = market.collect()[0]
    # WZS (1000-200)*0.5/1000 + WKS 400*0.4/1000
    assert m.amount == pytest.approx(0.4 + 0.16)
    assert m.ytm_amount == pytest.approx((5000 - 800) * 0.5 / 1000
                                         + 2000 * 0.4 / 1000)

    zero = green.filter("1=0")
    location = s2_series(elect, zero, coef)
    loc = location.collect()[0]
    assert loc.amount == pytest.approx(0.5 + 0.16)

    s1, s1n2 = s1_and_s1n2(location, market)
    assert s1.collect()[0].amount == pytest.approx((0.5 + 0.16) * SCOPE1_FACTOR)
    assert s1n2.collect()[0].amount == pytest.approx(
        (0.5 + 0.16) * SCOPE1_FACTOR + 0.56)


def test_scope_cal_current_year_slices(spark):
    """staging_cal.py:109-175: certificates count against market
    scope 2 but NOT location scope 2."""
    import datetime as dt

    from esg_decarbonization_data_integration_and_data_pipline_spark.pipelines.scope_overview import (
        scope_cal_current_year,
    )
    may = dt.date(2024, 5, 1)
    sch = "site string, period_start date, amount double, ytm_amount double"
    elect = spark.createDataFrame([("WZS", may, 1000.0, 1000.0)], sch)
    solar = spark.createDataFrame([("WZS", may, 100.0, 100.0)], sch)
    certs = spark.createDataFrame([("WZS", may, 300.0, 300.0)], sch)
    green = spark.createDataFrame([("WZS", may, 200.0, 200.0)], sch)
    coef = spark.createDataFrame([("WZS", 0.5)], "site string, coef double")
    market, location, s1, s1n2 = scope_cal_current_year(
        elect, solar, certs, green, coef)
    assert market.collect()[0].amount == pytest.approx(
        (1000 - 600) * 0.5 / 1000)
    assert location.collect()[0].amount == pytest.approx(
        (1000 - 300) * 0.5 / 1000)
