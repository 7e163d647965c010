"""Golden tests for the simulator, ESGI ingest, gap-fix and MACC
pipelines."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from esg_decarbonization_data_integration_and_data_pipline_spark.functions.finance import (
    grouped_irr, irr_bisect,
)
from esg_decarbonization_data_integration_and_data_pipline_spark.pipelines.esgi_ingest import esgi_to_raw
from esg_decarbonization_data_integration_and_data_pipline_spark.pipelines.gap_fix import (
    import_actual_elect, reconcile_sources, synthesize_missing_sites,
)
from esg_decarbonization_data_integration_and_data_pipline_spark.pipelines.macc import macc_summary
from esg_decarbonization_data_integration_and_data_pipline_spark.pipelines.simulator import (
    bump_version, month_shares, simulate_future, trend_rates,
)


def _history(spark):
    # two sites x two years, deterministic monthly split 60/40
    rows = []
    for year, scale in [(2022, 1.0), (2023, 1.21)]:  # 21% growth over 1y
        rows += [("WZS", "P1", year, 1, 60.0 * scale),
                 ("WZS", "P1", year, 2, 40.0 * scale),
                 ("WKS", "P2", year, 1, 10.0 * scale)]
    return spark.createDataFrame(
        rows, "site string, plant string, year int, month int, amount double")


def test_trend_rates_cagr_and_clamp(spark):
    rates = {(r.site, r.plant): r for r in trend_rates(_history(spark)).collect()}
    assert rates[("WZS", "P1")].rate == pytest.approx(0.21, abs=1e-9)
    assert rates[("WZS", "P1")].last_total == pytest.approx(121.0)
    # explosive growth clamps at +0.5
    hist = spark.createDataFrame(
        [("S", "P", 2022, 1, 1.0), ("S", "P", 2023, 1, 100.0)],
        "site string, plant string, year int, month int, amount double")
    assert trend_rates(hist).collect()[0].rate == 0.5


def test_month_shares(spark):
    shares = {(r.site, r.plant, r.month): r.share
              for r in month_shares(_history(spark)).collect()}
    assert shares[("WZS", "P1", 1)] == pytest.approx(0.6)
    assert shares[("WZS", "P1", 2)] == pytest.approx(0.4)
    assert shares[("WKS", "P2", 1)] == pytest.approx(1.0)


def test_simulate_future_years(spark):
    out = {(r.site, r.plant, r.year, r.month): r.amount
           for r in simulate_future(_history(spark), horizon=2).collect()}
    # amounts round to cents; year +1: 121 * 1.21 = 146.41, split 60/40
    assert out[("WZS", "P1", 2024, 1)] == pytest.approx(146.41 * 0.6, abs=5e-3)
    assert out[("WZS", "P1", 2025, 2)] == pytest.approx(121 * 1.21**2 * 0.4, abs=5e-3)
    # second site grows at the same 21% CAGR: 12.1 * 1.21^2
    assert out[("WKS", "P2", 2025, 1)] == pytest.approx(12.1 * 1.21**2, abs=5e-3)
    assert len(out) == 2 * 3  # 2 horizon years x 3 site-plant-months


def test_bump_version(spark):
    v = spark.createDataFrame([("V1",), ("V5",), ("V3",)], "version string")
    assert bump_version(v) == "V6"
    empty = spark.createDataFrame([], "version string")
    assert bump_version(empty) == "V1"


def test_irr_matches_known_value(spark):
    # cashflows -100, +60, +60: IRR satisfies NPV=0 -> r ~ 0.13066
    assert irr_bisect([-100.0, 60.0, 60.0]) == pytest.approx(0.13066, abs=1e-4)
    df = spark.createDataFrame(
        [("b", 2022, 100.0), ("b", 2023, 60.0), ("b", 2024, 60.0)],
        "grp string, year int, revenue double")
    out = grouped_irr(df, ["grp"], "year", "revenue").collect()[0]
    # first value negated x3: [-300, 60, 60] -> deeply negative IRR
    assert out.irr < 0


def test_esgi_ingest_normalization(spark):
    raw = spark.createDataFrame(
        [("總用電度數", "old_code", dt.date(2023, 5, 1), "1.5", 1),
         ("總用電度數", "P2", dt.date(2023, 5, 1), "NA", 2),      # NA -> 0
         ("綠電電量", "P2", dt.date(2023, 5, 1), "2", 3),
         ("無關指標", "P2", dt.date(2023, 5, 1), "9", 4)],        # dropped
        "data_name string, plant string, period_start date, data_value string, performance_goalsid int")
    mapping = spark.createDataFrame(
        [("WZS", "P1"), ("WZS", "P2")], "site string, plant string")
    out = esgi_to_raw({"esgi_indicators": raw, "plant_mapping": mapping},
                      plant_recode={"old_code": "P1"})
    elec = out["electricity_total_decarb"].collect()
    assert {(r.site, r.amount) for r in elec} == {("WZS", 1500.0)}  # 1.5x1000 + 0
    renew = out["renewable_energy_decarb"].collect()
    assert {(r.category, r.amount) for r in renew} == {("green_electricity", 2000.0)}


def test_gap_fix_synthesizes_zero_rows(spark):
    obs = spark.createDataFrame(
        [("WZS", 10.0, dt.date(2023, 5, 1)), ("WKS", 5.0, dt.date(2023, 5, 1)),
         ("WZS", 12.0, dt.date(2023, 11, 1))],  # WKS went silent by November
        "site string, amount double, period_start date")
    out = {r.site: r for r in synthesize_missing_sites(
        obs, dt.date(2023, 11, 1), dt.date(2023, 5, 1)).collect()}
    assert out["WZS"].amount == 12.0 and out["WZS"].synthesized is False
    assert out["WKS"].amount == 0.0 and out["WKS"].synthesized is True


def test_reconcile_sources_primary_wins(spark):
    csr = spark.createDataFrame(
        [("WZS", dt.date(2023, 5, 1), 100.0)],
        "site string, period_start date, amount double")
    esgi = spark.createDataFrame(
        [("WZS", dt.date(2023, 5, 1), 999.0), ("WKS", dt.date(2023, 5, 1), 7.0)],
        "site string, period_start date, amount double")
    out = {r.site: r.amount for r in
           reconcile_sources(csr, esgi).collect()}
    assert out == {"WZS": 100.0, "WKS": 7.0}


def test_import_actual_elect_stamps_latest_validated_predict(spark):
    """fix_data.py:327-430: WIHK CSR-over-ESGI reconcile feeds the
    monthly frame; both outputs carry the version/sign-off/update of
    the predict row at the MAX validated version; year rows sum the
    months per site."""
    monthly = spark.createDataFrame(
        [("WZS", 10.0, dt.date(2024, 1, 1)),
         ("WZS", 20.0, dt.date(2024, 2, 1))],
        "site string, amount double, period_start date")
    csr = spark.createDataFrame(
        [("WIHK-1", dt.date(2024, 1, 1), 5.0)],
        "site string, period_start date, amount double")
    esgi = spark.createDataFrame(
        [("WIHK-1", dt.date(2024, 1, 1), 999.0),   # CSR wins
         ("WIHK-1", dt.date(2024, 2, 1), 6.0)],    # ESGI fills the gap
        "site string, period_start date, amount double")
    versions = spark.createDataFrame(
        [(2, "s2", dt.datetime(2024, 3, 1), 2024, "predict", True),
         (3, "s3", dt.datetime(2024, 4, 1), 2024, "predict", False),
         (2, "x", dt.datetime(2024, 3, 1), 2023, "predict", True)],
        "version int, sign_off_id string, last_update_time timestamp, "
        "year int, category string, validate boolean")
    month_rows, year_rows = import_actual_elect(
        {"monthly": monthly, "csr": csr, "esgi": esgi,
         "versions": versions}, 2024)

    m = {(r.site, r.month): r for r in month_rows.collect()}
    assert m[("WIHK-1", 1)].amount == 5.0      # CSR over ESGI
    assert m[("WIHK-1", 2)].amount == 6.0      # ESGI gap fill
    assert m[("WZS", 1)].amount == 10.0
    row = m[("WZS", 2)]
    # version 3 is not validated -> stamp comes from version 2
    assert (row.version, row.sign_off_id) == (2, "s2")
    assert row.category == "actual" and row.validate is True

    y = {r.site: r for r in year_rows.collect()}
    assert y["WZS"].amount == 30.0 and y["WIHK-1"].amount == 11.0
    assert y["WZS"].year == 2024 and y["WZS"].version == 2


def test_macc_summary_curve(spark):
    measures = spark.createDataFrame(
        [("m1", "WZS", 2025, 730.0, 10.0),   # expensive per ton after discount
         ("m2", "WZS", 2025, 146.0, 20.0),   # cheapest
         ("m3", "WKS", 2025, 365.0, 10.0)],
        "measure_id string, site string, year int, cost_rmb double, abatement_tons double")
    fx = spark.createDataFrame([(2025, 0.14)], "year int, rmb_to_usd double")
    wacc = spark.createDataFrame([(0.1,)], "wacc double")
    out = {r.measure_id: r for r in macc_summary(
        {"measures": measures, "fx": fx, "wacc": wacc}, base_year=2023).collect()}
    # discount = 1.1^2 = 1.21; m2: 146*0.14/1.21 = 16.8926.. per 20t
    assert out["m2"].cost_usd_pv == pytest.approx(146 * 0.14 / 1.21, abs=1e-4)
    assert out["m2"].rank == 1
    assert out["m1"].rank == 3
    assert out["m1"].cum_abatement == pytest.approx(40.0)  # 20 + 10 + 10


def test_energy_saving_series_melts_and_cumsums(spark):
    """staging_cal.py:258-283: wide month columns -> monthly series
    with per-year YTM; duplicate uploads for one month sum first."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.pipelines.scope_overview import (
        energy_saving_series,
    )
    wide_cols = ("year int, jan double, feb double, mar double, "
                 "apr double, may double, jun double, jul double, "
                 "aug double, sep double, oct double, nov double, "
                 "dec double")
    df = spark.createDataFrame(
        [(2023, 1.0, 2.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 4.0),
         (2023, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)],
        wide_cols)
    out = {(r.period_start.month): r for r in
           energy_saving_series(df, "saving_upload").collect()}
    assert out[1].amount == 2.0          # duplicate uploads summed
    assert out[2].ytm_amount == 4.0      # 2 + 2
    assert out[12].ytm_amount == 8.0
    assert out[1].category == "energy_efficiency"
    assert out[1].type == "saving_upload"
    assert len(out) == 12


def test_quantile_floor_rates(spark):
    """Factory_elect_simulator_update.py:214-237: negatives replaced
    by the exact p25 of positive rates; all-negative input unchanged."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.pipelines.simulator import (
        quantile_floor_rates,
    )
    rates = spark.createDataFrame(
        [("P1", 0.10), ("P2", 0.20), ("P3", 0.30), ("P4", 0.40),
         ("P5", -0.05)],
        "plant string, rate double")
    out = {r.plant: r.rate for r in quantile_floor_rates(rates).collect()}
    # numpy-style linear interpolation p25 of [.1,.2,.3,.4] = 0.175
    assert out["P5"] == pytest.approx(0.175)
    assert out["P1"] == 0.10
    neg = spark.createDataFrame([("P1", -0.3)], "plant string, rate double")
    assert quantile_floor_rates(neg).collect()[0].rate == pytest.approx(-0.3)


def test_ten_month_real_power(spark):
    """Factory_elect_simulator_update.py:172-192: Jan-Oct only, dorm
    annualized by 12/month_count, incomplete groups dropped."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.pipelines.simulator import (
        ten_month_real_power,
    )
    rows = [("P1", "WZS", dt.date(2023, m, 1), 100.0, 10.0)
            for m in range(1, 13)]                       # full year
    rows += [("P1", "WZS", dt.date(2023, 3, 1), 100.0, 10.0)]  # re-upload
    rows += [("P2", "WKS", dt.date(2023, m, 1), 50.0, 5.0)
             for m in range(1, 6)]                       # only 5 months
    df = spark.createDataFrame(
        rows, "plant string, site string, period_start date, "
              "factory_kwh double, dorm_kwh double")
    out = ten_month_real_power(df).collect()
    assert len(out) == 1                                 # P2 incomplete
    r = out[0]
    # duplicated March sums into its month; month_count stays 10
    assert r.plant == "P1" and r.month_count == 10
    # (10x100 + 100) factory + 12 x (10x10 + 10 dorm) / 10
    assert r.ten_month_real == pytest.approx(1100.0 + 132.0)


def test_point_fix_copy_month(spark):
    """Factory_elect_simulator_update.py:238-248: WOK's December rows
    are replaced by its November rows re-dated; other plants and
    months untouched. Idempotent under re-run."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.pipelines.simulator import (
        point_fix_copy_month,
    )
    df = spark.createDataFrame(
        [("WOK", dt.date(2022, 11, 1), 100.0),
         ("WOK", dt.date(2022, 12, 1), -5.0),   # broken reading
         ("WZS", dt.date(2022, 12, 1), 70.0)],
        "plant string, datetime date, kwh double")
    out = point_fix_copy_month(df, "WOK", "2022-11-01", "2022-12-01")
    got = {(r.plant, str(r.datetime)): r.kwh for r in out.collect()}
    assert got == {("WOK", "2022-11-01"): 100.0,
                   ("WOK", "2022-12-01"): 100.0,   # copied over
                   ("WZS", "2022-12-01"): 70.0}
    again = point_fix_copy_month(out, "WOK", "2022-11-01", "2022-12-01")
    assert {(r.plant, str(r.datetime), r.kwh) for r in again.collect()} == \
        {(p, d, v) for (p, d), v in got.items()}


def test_attach_observed_max(spark):
    """Factory_elect_simulator_update.py:259-263: datetime_max per
    (plant, bo) = last month with ALL measures observed."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.pipelines.simulator import (
        attach_observed_max,
    )
    df = spark.createDataFrame(
        [("P1", "nb", dt.date(2023, 1, 1), 1.0, 2.0),
         ("P1", "nb", dt.date(2023, 2, 1), 1.0, None),   # partial month
         ("P2", "mb", dt.date(2023, 3, 1), None, None)],  # never complete
        "plant string, bo string, datetime date, elec double, qty double")
    out = attach_observed_max(df, ["plant", "bo"], ["elec", "qty"])
    got = {(r.plant, str(r.datetime)): r.datetime_max for r in out.collect()}
    assert str(got[("P1", "2023-01-01")]) == "2023-01-01"
    assert str(got[("P1", "2023-02-01")]) == "2023-01-01"
    assert got[("P2", "2023-03-01")] is None


def test_actuals_over_forecast(spark):
    """Factory_elect_simulator_update.py:387-422: workspace actuals
    replace forecasts; later years synthesized from the previous
    two-year positive month means, iteratively."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.pipelines.simulator import (
        actuals_over_forecast,
    )
    forecast = spark.createDataFrame(
        [("WZS", 2023, 1, 500.0),          # non-workspace: passes through
         ("WSP", 2023, 1, 999.0)],         # workspace forecast row
        "site string, year int, month int, amount double")
    actuals = spark.createDataFrame(
        [("WSP", 2022, 1, 100.0),
         ("WSP", 2023, 1, 0.0)],           # zero row: excluded from means
        "site string, year int, month int, amount double")
    out = actuals_over_forecast(forecast, actuals, ["WSP"],
                                target_year=2025, base_year=2022)
    rows = out.collect()
    got = {(r.site, r.year, r.month): r.amount for r in rows}
    # exactly one row per (site, year, month) -- actuals WIN conflicts
    assert len(rows) == len(got)
    assert got[("WZS", 2023, 1)] == 500.0
    assert got[("WSP", 2022, 1)] == 100.0
    assert got[("WSP", 2023, 1)] == 0.0      # actual overrides the 999
    # 2024 = mean of positive amounts in 2022-2023: only the 100
    assert got[("WSP", 2024, 1)] == pytest.approx(100.0)
    # 2025 = mean over 2023-2024 positives: only 2024's 100
    assert got[("WSP", 2025, 1)] == pytest.approx(100.0)


def test_actuals_over_forecast_empty_workspace(spark):
    """No workspace rows at all degrades to forecast passthrough."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.pipelines.simulator import (
        actuals_over_forecast,
    )
    forecast = spark.createDataFrame(
        [("WZS", 2023, 1, 500.0)],
        "site string, year int, month int, amount double")
    actuals = spark.createDataFrame(
        [], "site string, year int, month int, amount double")
    out = actuals_over_forecast(forecast, actuals, ["WSP"],
                                target_year=2025, base_year=2022)
    assert [(r.site, r.year, r.month, r.amount) for r in out.collect()] \
        == [("WZS", 2023, 1, 500.0)]


def test_shipment_growth_ladder(spark):
    """Factory_elect_simulator_update.py:495-516: consecutive-year
    GR, >1000 clamps to 0.5, single-year sites get half the span
    rate on the last two plan years."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.pipelines.shipments import (
        shipment_growth_ladder,
    )
    plan = spark.createDataFrame(
        [("A", 2023, 1, 100.0), ("A", 2024, 1, 150.0), ("A", 2025, 1, 120.0),
         ("B", 2023, 1, 0.00001), ("B", 2024, 1, 100.0),  # exploding base
         ("C", 2024, 1, 80.0), ("C", 2026, 1, 120.0)],    # no consecutive pair
        "site string, year int, month int, amount double")
    got = {(r.site, r.year): r.gr for r in shipment_growth_ladder(plan).collect()}
    assert got[("A", 2024)] == pytest.approx(0.5)      # 100 -> 150
    assert got[("A", 2025)] == pytest.approx(-0.2)     # 150 -> 120
    assert got[("B", 2024)] == pytest.approx(0.5)      # clamped
    # C: (120 - 80) / 80 / 2 = 0.25 on last two years
    assert got[("C", 2026)] == pytest.approx(0.25)
    assert got[("C", 2025)] == pytest.approx(0.25)
    assert ("C", 2024) not in got


def test_shipment_3y_spread_and_override(spark):
    """Factory_elect_simulator_update.py:519-540: site-year totals
    spread by budget plant-month rates; budget-less sites keep a
    site-level row; explicit plant-month overrides win."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.pipelines.shipments import (
        shipment_3y_forecast,
    )
    plan = spark.createDataFrame(
        [("WZS", 2024, 1, 0.06), ("WZS", 2024, 2, 0.04),  # total 100 after x1000
         ("WNEW", 2024, 1, 0.01)],                        # not in budget
        "site string, year int, month int, amount double")
    budget = spark.createDataFrame(
        [("WZS", "WZS-1", 2024, 1, 30.0), ("WZS", "WZS-1", 2024, 2, 10.0),
         ("WZS", "WZS-8", 2024, 1, 40.0), ("WZS", "WZS-8", 2024, 2, 20.0)],
        "site string, plant string, year int, month int, shipment_qty double")
    overrides = spark.createDataFrame(
        [("WZS-8", 2024, 1, 7.0)],
        "plant string, year int, month int, amount double")
    spread, ladder = shipment_3y_forecast(plan, budget, overrides)
    got = {(r.plant, r.year, r.month): r.amount for r in spread.collect()}
    # budget shares: WZS-1 m1 30/100, m2 10/100; WZS-8 m1 40/100, m2 20/100
    assert got[("WZS-1", 2024, 1)] == pytest.approx(30.0)
    assert got[("WZS-1", 2024, 2)] == pytest.approx(10.0)
    assert got[("WZS-8", 2024, 1)] == pytest.approx(7.0)   # override wins
    assert got[("WZS-8", 2024, 2)] == pytest.approx(20.0)
    # site without budget: one pseudo-plant row, rate 1
    assert got[("WNEW", 2024, 1)] == pytest.approx(10.0)
    # single-year sites fall into the span fallback with a 0 rate
    lg = {(r.site, r.year): r.gr for r in ladder.collect()}
    assert lg[("WZS", 2024)] == pytest.approx(0.0)
    assert lg[("WNEW", 2024)] == pytest.approx(0.0)


def test_plant_month_rates_multi_year_budget_no_fanout(spark):
    """Review fix: a budget spanning two years must yield ONE rate set
    (latest year only), not a per-budget-year fan-out that doubles the
    spread totals."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.pipelines.shipments import (
        plant_month_rates, spread_yearly_shipments,
    )
    budget = spark.createDataFrame(
        [("WZS", "WZS-1", 2023, 1, 50.0), ("WZS", "WZS-8", 2023, 1, 50.0),
         ("WZS", "WZS-1", 2024, 1, 30.0), ("WZS", "WZS-8", 2024, 1, 70.0)],
        "site string, plant string, year int, month int, shipment_qty double")
    rates = plant_month_rates(budget)
    got = {(r.plant, r.month): r.rate for r in rates.collect()}
    assert len(got) == 2                      # latest year only
    assert got[("WZS-1", 1)] == pytest.approx(0.3)
    assert got[("WZS-8", 1)] == pytest.approx(0.7)
    yearly = spark.createDataFrame([("WZS", 2025, 1000.0)],
                                   "site string, year int, total double")
    spread = spread_yearly_shipments(yearly, rates)
    total = sum(r.amount for r in spread.collect())
    assert total == pytest.approx(1000.0)     # shares sum to 1, no fan-out


def test_growth_ladder_zero_base_clamps(spark):
    """Review fix: a 0 base year is the pandas inf path -> clamps to
    0.5 instead of producing a NULL rate."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.pipelines.shipments import (
        shipment_growth_ladder,
    )
    plan = spark.createDataFrame(
        [("Z", 2023, 1, 0.0), ("Z", 2024, 1, 50.0), ("Z", 2025, 1, 50.0)],
        "site string, year int, month int, amount double")
    got = {(r.site, r.year): r.gr for r in shipment_growth_ladder(plan).collect()}
    assert got[("Z", 2024)] == pytest.approx(0.5)   # 0 -> 50: inf clamp
    assert got[("Z", 2025)] == pytest.approx(0.0)   # 50 -> 50: flat
