from __future__ import annotations

import pytest

from esg_decarbonization_data_integration_and_data_pipline_spark.pipelines.decarb_path import (
    decarb_path,
)

S1F = 0.06 / 0.94


def _tables(spark):
    simulate = spark.createDataFrame(
        [("AAA", 2025, 1000.0, 3, 2024), ("WMY", 2025, 500.0, 3, 2024),
         ("AAA", 2026, 2000.0, 3, 2024),
         ("AAA", 2025, 999.0, 2, 2024),      # superseded version
         ("AAA", 2025, 888.0, 3, 2023)],     # superseded version_year
        "site string, year int, amount double, version int, version_year int")
    renewable_setting = spark.createDataFrame(
        [(2025, "REC", 10.0), (2025, "PPA", 20.0), (2025, "solar", 30.0),
         (2026, "REC", 40.0),                # 2026 has only REC rows
         (2025, "other", 99.0)],             # ignored category
        "year int, category string, amount double")
    coef = spark.createDataFrame(
        [("AAA", 2025, 0.5), ("AAA", 2026, 0.5),
         # raw aliases both recode to WMY then collapse via dedup
         ("WMYP1", 2025, 0.4), ("WMYP2", 2025, 0.4)],
        "site string, year int, amount double")
    return {"simulate": simulate, "renewable_setting": renewable_setting,
            "coef": coef}


def test_decarb_path_scope_split(spark):
    rows = decarb_path(_tables(spark)).collect()
    by_key = {(r.year, r.category): r for r in rows}

    # base_2025 = (1000*0.5 + 500*0.4)/1000 = 0.7 kt; coef aliases
    # WMYP1/WMYP2 recoded to WMY and deduped before the join
    base = 0.7
    assert by_key[(2025, "Scope 2 (Scope 2-REC)")].amount == pytest.approx(
        base * (1 - 0.6))
    assert by_key[(2025, "Scope 1")].amount == pytest.approx(
        base * (1 - 0.5) * S1F)           # location-based excludes REC
    assert by_key[(2025, "RECs")].amount == pytest.approx(base * 0.1)
    assert by_key[(2025, "Solar Power Generation")].amount == pytest.approx(
        base * 0.3)
    assert by_key[(2025, "PPA")].amount == pytest.approx(base * 0.2)

    # 2026: only REC settings exist -> location-based/PPA/solar are 0,
    # market uses 1-0.4, RECs uses 0.4 (base = 2000*0.5/1000 = 1.0)
    assert by_key[(2026, "Scope 1")].amount == 0.0
    assert by_key[(2026, "Scope 2 (Scope 2-REC)")].amount == pytest.approx(0.6)
    assert by_key[(2026, "RECs")].amount == pytest.approx(0.4)
    assert by_key[(2026, "PPA")].amount == 0.0

    r = by_key[(2025, "RECs")]
    assert r.unit == "Tonnes CO2e" and r.version == 2024 and r.type == "target"
    # 2 years x 5 categories, superseded versions excluded
    assert len(rows) == 10
