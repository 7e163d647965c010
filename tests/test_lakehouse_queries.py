"""Shared-fixture discipline for the r11 lakehouse audit queries
(plans/fixtures.py + plans/queries_lakehouse.py).

The four mutating audits (purge/constraints/DDL/bloom) and the
read-only versioned_table_audit share ONE memoized 3-commit fixture
build; correctness here means (a) the shared dir really is reused,
(b) mutating queries never touch it (copy-on-use), so (c) every
query is rerunnable with identical results in any order -- the bench
runs each 3x and the driver interleaves them arbitrarily.
Value-level correctness vs DuckDB is covered for all four by the
registry replay in tests/test_queries_oracle.py.
"""

from __future__ import annotations

import os

from esg_decarbonization_data_integration_and_data_pipline_spark.plans.fixtures import (
    copy_fixture,
    orders_versioned_fixture,
)
from esg_decarbonization_data_integration_and_data_pipline_spark.plans.queries import QUERY_FNS


def _snapshot(td: str) -> dict[str, float]:
    out = {}
    for root, _dirs, files in os.walk(td):
        for f in files:
            p = os.path.join(root, f)
            out[os.path.relpath(p, td)] = os.path.getmtime(p)
    return out


def test_fixture_is_memoized_per_sf_dir(spark, sf_dir):
    a = orders_versioned_fixture(spark, sf_dir)
    b = orders_versioned_fixture(spark, sf_dir)
    assert a == b
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
        committed_versions, current_version,
    )

    assert current_version(a) == 3
    assert committed_versions(a) == [1, 2, 3]


def test_copy_fixture_is_isolated(spark, sf_dir):
    src = orders_versioned_fixture(spark, sf_dir)
    cp = copy_fixture(src)
    assert cp != src
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
        append_version, current_version, read_version,
    )

    append_version(read_version(spark, cp, 3).limit(1), cp)
    assert current_version(cp) == 4
    assert current_version(src) == 3  # source untouched


def test_mutating_queries_leave_the_shared_fixture_pristine(
        spark, sf_dir):
    """Every lakehouse audit must be rerunnable with byte-identical
    fixture state: run each once, assert the shared dir's file set
    and mtimes never moved, then rerun one mutator and the read-only
    audit and compare results row-for-row."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.plans.fixtures import (
        scd2_customer_fixture,
    )

    src = orders_versioned_fixture(spark, sf_dir)
    scd_src = scd2_customer_fixture(spark, sf_dir)
    before = _snapshot(src)
    scd_before = _snapshot(scd_src)
    results = {}
    for name in ("purge_erasure_audit", "constraints_history_audit",
                 "ddl_timetravel_audit", "bloom_point_lookup_orders",
                 "versioned_table_audit", "scd2_customer_history",
                 "scd2_asof_fact_join", "clone_divergence_audit",
                 "fsck_report_audit"):
        results[name] = sorted(
            map(tuple, QUERY_FNS[name](spark, sf_dir).collect()))
    assert _snapshot(src) == before, "a query mutated the shared fixture"
    assert _snapshot(scd_src) == scd_before, (
        "a query mutated the shared SCD2 fixture")
    for name in ("purge_erasure_audit", "versioned_table_audit",
                 "scd2_asof_fact_join"):
        again = sorted(
            map(tuple, QUERY_FNS[name](spark, sf_dir).collect()))
        assert again == results[name], f"{name} not rerun-stable"


def test_purge_audit_shape(spark, sf_dir):
    rows = {r.version: r for r in
            QUERY_FNS["purge_erasure_audit"](spark, sf_dir).collect()}
    assert set(rows) == {1, 2, 3}
    for v, r in rows.items():
        assert r.n_match_after == 0, "erasure incomplete"
        assert r.n_rows_after == r.n_rows_before - r.n_match_before, (
            "purge removed a non-matching row")
    # the subject must actually exist somewhere, or the audit is vacuous
    assert sum(r.n_match_before for r in rows.values()) > 0
