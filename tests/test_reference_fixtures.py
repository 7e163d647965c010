"""The reference's own unit-test fixtures, mirrored exactly.

The reference ships exactly one spec for its source->raw jobs: the
1-row mock fixtures in tests/jobs_source_to_raw_test.py:16-49 (the
only public evidence for behavior the production databases otherwise
define). These tests replay those fixtures through our pipeline
equivalents so the inferred semantics stay pinned to that evidence
(r7 verdict task #7):

- test_fem_ratio / test_fem_ratio_solar (reference lines 16-36):
  FEM_elect = 1 row (plant_code1, datadate1, power=1), plant_map =
  (site1, plant1, plant_code1).  fem_ratio_cal merges on plant_code,
  groups on the plant NAME (plant_map aliases plant_name AS plant,
  jobs/source_to_raw/fem_ratio.py:13-17), and emits ratio =
  power / total -> exactly one row (amount=1, plant='plant1',
  ratio=1.0).
- test_solar_ratio (reference lines 38-45): 1 row (plant1, amount=1,
  period 2023-09-13) -> ratio = amount / sum(amount) = 1.0
  (jobs/source_to_raw/solar_ratio.py:16).
- test_solar (reference lines 47-55): the REST payload arrives EMPTY
  ({'datetime': [], 'actual': [], 'target': [], 'rate': []}) and the
  job must still succeed -- the all-empty-payload path.
"""

from __future__ import annotations

import datetime as dt

import pytest

from esg_decarbonization_data_integration_and_data_pipline_spark.pipelines.fem_ratio import fem_ratio
from esg_decarbonization_data_integration_and_data_pipline_spark.pipelines.solar_rest import (
    solar_from_rest,
)
from esg_decarbonization_data_integration_and_data_pipline_spark.operators.windows import (
    share_of_total,
)

# the reference fixtures carry no real dates ("datadate1"), because
# the SQL WHERE clauses are mocked away -- here the window filters are
# real, so the fixture row is dated inside the processing month
RUN = dt.date(2023, 10, 1)  # processing month 2023-09 (per the
#                             solar_ratio fixture's 2023-09-13)


def test_fem_ratio_one_row_fixture(spark):
    """Reference tests/jobs_source_to_raw_test.py:16-24: the 1-row
    power table joined to the 1-row plant map must yield exactly one
    output row with ratio 1.0 and the plant NAME as the label."""
    daily = spark.createDataFrame(
        [("site1", "plant_code1", dt.date(2023, 9, 13), 1.0, "用電量")],
        "site string, plant_code string, datadate date, power double, "
        "consumetype string")
    mapping = spark.createDataFrame(
        [("site1", "plant1", "plant_code1")],
        "site string, plant_name string, plant_code string")
    rows = fem_ratio({"fem_dailypower": daily, "plant_mapping": mapping},
                     RUN).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.plant == "plant1"          # the NAME, not plant_code1
    assert r.amount == 1.0
    assert r.ratio == pytest.approx(1.0)
    assert str(r.period_start) == "2023-09-01"
    assert r.category == "plant"


def test_fem_ratio_solar_site_scoped_fixture(spark):
    """Reference tests/jobs_source_to_raw_test.py:26-36
    (fem_ratio_solar): identical fixture, site-scoped variant -- the
    same single row must survive the site filter and a row for any
    OTHER site must not."""
    daily = spark.createDataFrame(
        [("WKS", "plant_code1", dt.date(2023, 9, 13), 1.0, "用電量"),
         ("ZZZ", "plant_codeX", dt.date(2023, 9, 13), 9.0, "用電量")],
        "site string, plant_code string, datadate date, power double, "
        "consumetype string")
    mapping = spark.createDataFrame(
        [("WKS", "plant1", "plant_code1"), ("ZZZ", "plantX", "plant_codeX")],
        "site string, plant_name string, plant_code string")
    rows = fem_ratio({"fem_dailypower": daily, "plant_mapping": mapping},
                     RUN, sites=["WKS"]).collect()
    assert [(r.plant, r.amount, r.ratio) for r in rows] == \
        [("plant1", 1.0, 1.0)]


def test_solar_ratio_one_row_fixture(spark):
    """Reference tests/jobs_source_to_raw_test.py:38-45: one
    renewable-energy row (plant1, amount=1, 2023-09-13) -> ratio =
    amount / sum(amount) = 1.0 (solar_ratio.py:16)."""
    wzs = spark.createDataFrame(
        [("plant1", 1.0, dt.date(2023, 9, 13))],
        "plant string, amount double, period_start date")
    rows = share_of_total(wzs, [], "amount", out_col="ratio").collect()
    assert len(rows) == 1
    assert rows[0].plant == "plant1"
    assert rows[0].ratio == pytest.approx(1.0)


def test_solar_empty_rest_payload_fixture(spark):
    """Reference tests/jobs_source_to_raw_test.py:47-55: the solar job
    runs against an API returning an EMPTY payload
    ({'datetime': [], 'actual': [], 'target': [], 'rate': []}) and
    must succeed -- our REST ingest must produce a valid empty frame
    with the declared schema, not raise."""
    out = solar_from_rest(spark, lambda: [], RUN)
    assert out.count() == 0
    assert out.columns == ["plant", "category", "amount",
                           "period_start", "type"]


def test_fem_ratio_mapping_distinct_across_sites(spark):
    """The reference's plant_map query is SELECT DISTINCT
    (fem_ratio.py:13): the same (code, name) pair listed under two
    sites must not double the joined power rows."""
    daily = spark.createDataFrame(
        [("site1", "plant_code1", dt.date(2023, 9, 13), 1.0, "用電量")],
        "site string, plant_code string, datadate date, power double, "
        "consumetype string")
    mapping = spark.createDataFrame(
        [("site1", "plant1", "plant_code1"),
         ("site2", "plant1", "plant_code1")],  # same pair, second site
        "site string, plant_name string, plant_code string")
    rows = fem_ratio({"fem_dailypower": daily, "plant_mapping": mapping},
                     RUN).collect()
    assert [(r.plant, r.amount, r.ratio) for r in rows] == \
        [("plant1", 1.0, 1.0)]


def test_fem_ratio_mapping_site_scoped_before_distinct(spark):
    """The reference scopes plant_map to the job's site BEFORE the
    DISTINCT (`WHERE site in ('{site}')`, fem_ratio.py:13): a
    plant_code mapped to a DIFFERENT name under another site must not
    fan out the join and double-count that code's power (r8 advisor
    finding)."""
    daily = spark.createDataFrame(
        [("site1", "plant_code1", dt.date(2023, 9, 13), 1.0, "用電量")],
        "site string, plant_code string, datadate date, power double, "
        "consumetype string")
    mapping = spark.createDataFrame(
        [("site1", "plantA", "plant_code1"),
         ("site2", "plantB", "plant_code1")],  # same code, other name
        "site string, plant_name string, plant_code string")
    rows = fem_ratio({"fem_dailypower": daily, "plant_mapping": mapping},
                     RUN, sites=["site1"]).collect()
    assert [(r.plant, r.amount, r.ratio) for r in rows] == \
        [("plantA", 1.0, 1.0)]


# ---------------------------------------------------------------------------
# The reference's OTHER unit-test file, replayed verbatim:
# tests/helpers_decarb_date_test.py:10-36 pins DecarbDate.start_time/
# end_time for the two documented cases (a December run -> the
# November window; a January run -> the prior December window, the
# year-wrap branch).  Our processing_window(run_date) is the
# explicit-date twin of that now()-bound pair, so each reference
# (mocked_now, expected) pair maps 1:1 -- including the reference's
# exact expected STRINGS (its API returns '%Y-%m-%d' text).


@pytest.mark.parametrize(
    "mocked_now, expected_start, expected_end",
    [
        # test_start_date_given_month_12_should_get_lastMonth +
        # test_end_date_given_month_1_should_get_lastMonth (both
        # patch now=2023-12-01 in the reference)
        (dt.date(2023, 12, 1), "2023-11-01", "2023-11-30"),
        # test_start_date_given_month_1_should_get_last_dec +
        # test_end_date_given_month_1_should_get_last_dec (the
        # January year-wrap branch, now=2023-01-01)
        (dt.date(2023, 1, 1), "2022-12-01", "2022-12-31"),
    ])
def test_decarb_date_reference_cases_verbatim(mocked_now,
                                              expected_start,
                                              expected_end):
    from esg_decarbonization_data_integration_and_data_pipline_spark.functions.calendar import (
        processing_window,
    )

    start, end = processing_window(mocked_now)
    assert start.strftime("%Y-%m-%d") == expected_start
    assert end.strftime("%Y-%m-%d") == expected_end


def test_decarb_date_reference_rule_all_months():
    """Beyond the reference's two sampled months: its rule ('subtract
    one month; January wraps to last December; end = mdays of the
    processing month') replayed for every month of a leap AND a
    non-leap year, so the calendar.mdays quirk (Feb end) stays
    pinned.  calendar.mdays[2] == 28 -- the reference would emit
    2024-02-28 for a March 2024 run even though 2024 is a leap year;
    our processing_window uses monthrange and returns the TRUE month
    end (2024-02-29), a deliberate, documented divergence: the
    reference's mdays lookup is a dormant bug (it never ran a March
    leap-year window in its committed tests), not a behavior to
    preserve."""
    import calendar as _cal

    from esg_decarbonization_data_integration_and_data_pipline_spark.functions.calendar import (
        processing_window,
    )

    for year in (2023, 2024):
        for month in range(1, 13):
            run = dt.date(year, month, 1)
            start, end = processing_window(run)
            py, pm = (year - 1, 12) if month == 1 else (year, month - 1)
            assert (start.year, start.month, start.day) == (py, pm, 1)
            true_end = _cal.monthrange(py, pm)[1]
            assert (end.year, end.month, end.day) == (py, pm, true_end)
            # the one divergence: leap-February (reference mdays
            # would say 28; we say 29)
            if pm == 2 and _cal.isleap(py):
                assert end.day == 29
