"""Declarative data-quality expectations (operators/expectations):
per-kind semantics incl. null handling, composite keys, the enforce
gate, declaration errors, and the scan-count discipline (row-level
checks share ONE scan; total scans = 1 + #unique + #foreign_key).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from esg_decarbonization_data_integration_and_data_pipline_spark.operators import expectations as E


@pytest.fixture()
def frame(spark):
    return spark.createDataFrame(
        [(1, "a", 5.0, 10), (2, "b", -1.0, 20),
         (2, "z", 3.0, None), (None, "a", 99.0, 30),
         (4, None, None, 10)],
        "id bigint, cat string, val double, fk bigint")


@pytest.fixture()
def ref(spark):
    return spark.createDataFrame([(10,), (20,)], "k bigint")


def _rows(df):
    return {r["check_name"]: r for r in df.collect()}


def test_row_level_kinds_and_null_semantics(spark, frame):
    got = _rows(E.report(frame, [
        E.not_null("id"), E.not_null("val"),
        E.in_range("val", 0, 10),
        E.in_range("val", lo=0, name="val_lo"),
        E.in_range("val", hi=10, name="val_hi"),
        E.in_set("cat", ["a", "b"]),
        E.matches("cat", "^[ab]$"),
    ]))
    # nulls count ONLY for not_null; other kinds skip them
    assert got["not_null:id"]["n_violations"] == 1
    assert got["not_null:val"]["n_violations"] == 1
    assert got["in_range:val"]["n_violations"] == 2  # -1 and 99
    assert got["in_range:val"]["n_rows"] == 5
    assert got["in_set:cat"]["n_violations"] == 1    # 'z'; null skipped
    assert got["matches:cat"]["n_violations"] == 1
    assert all(not r["passed"] for r in got.values()
               if r["n_violations"] > 0)
    # half-open ranges share the declared label kind
    lo = [r for r in got.values()
          if r["kind"] == "in_range" and r["n_violations"] == 1]
    assert len(lo) == 2  # lo-only sees -1; hi-only sees 99


def test_unique_counts_all_rows_in_dup_groups(spark, frame):
    got = _rows(E.report(frame, [E.unique("id"),
                                 E.unique("id", "cat",
                                          name="u_composite")]))
    assert got["unique:id"]["n_violations"] == 2   # both id=2 rows
    assert got["unique:id"]["n_rows"] == 5
    assert got["u_composite"]["n_violations"] == 0  # (2,b) != (2,z)
    assert got["u_composite"]["passed"]


def test_unique_skips_null_keys_like_sql_unique(spark):
    """Two NULL-keyed rows are NOT duplicates (SQL UNIQUE); they
    still count toward n_rows.  Police nulls with not_null."""
    df = spark.createDataFrame([(None,), (None,), (1,)], "id bigint")
    got = _rows(E.report(df, [E.unique("id")]))
    assert got["unique:id"]["n_violations"] == 0
    assert got["unique:id"]["n_rows"] == 3
    assert got["unique:id"]["passed"]


def test_in_set_rejects_none_values(spark):
    """NOT IN (... NULL) is never true, which would silently count
    zero violations -- declaring None in the set must raise."""
    with pytest.raises(ValueError, match="None"):
        E.in_set("cat", ["a", None])


def test_min_group_size_counts_rows_in_small_groups(spark, frame):
    """k-anonymity: rows whose quasi-identifier combo occurs fewer
    than k times are violations; nulls form groups like any value."""
    got = _rows(E.report(frame, [
        E.min_group_size("cat", 2),
        E.min_group_size(("cat",), 3, name="k3"),
    ]))
    # cat counts: a=2, b=1, z=1, null=1 -> k=2: 3 violating rows
    assert got["min_group_size:cat"]["n_violations"] == 3
    assert got["min_group_size:cat"]["n_rows"] == 5
    assert got["k3"]["n_violations"] == 5  # every group < 3
    with pytest.raises(ValueError):
        E.min_group_size("cat", 0)
    with pytest.raises(ValueError):
        E.min_group_size((), 2)


def test_foreign_key_skips_null_keys_and_counts_misses(spark, frame,
                                                       ref):
    got = _rows(E.report(frame, [E.foreign_key("fk", ref, "k")]))
    r = got["foreign_key:fk"]
    assert r["n_violations"] == 1   # fk=30; null fk skipped
    assert r["n_rows"] == 5         # ref key set deduped: no fan-out
    # a duplicated ref key must not inflate n_rows either
    dup_ref = ref.union(ref)
    got2 = _rows(E.report(frame, [E.foreign_key("fk", dup_ref, "k")]))
    assert got2["foreign_key:fk"]["n_rows"] == 5


def test_enforce_raises_with_failures_and_passes_clean(spark, frame,
                                                       ref):
    with pytest.raises(E.CheckFailedError) as ei:
        E.enforce(frame, [E.not_null("id"),
                          E.foreign_key("fk", ref, "k")])
    names = {r["check_name"] for r in ei.value.failures}
    assert names == {"not_null:id", "foreign_key:fk"}
    out = E.enforce(frame, [E.in_range("val", -10, 100),
                            E.unique("id", "cat")])
    assert out is frame


def test_declaration_errors(spark, frame, ref):
    with pytest.raises(ValueError):
        E.in_range("val")
    with pytest.raises(ValueError):
        E.in_set("cat", [])
    with pytest.raises(ValueError):
        E.unique()
    with pytest.raises(ValueError):
        E.foreign_key(("a", "b"), ref, "k")
    with pytest.raises(ValueError):
        E.report(frame, [])
    with pytest.raises(ValueError):
        E.report(frame, [E.not_null("id"), E.not_null("id")])


def test_empty_frame_reports_zero_rows_all_pass(spark):
    empty = spark.createDataFrame([], "id bigint, fk bigint")
    ref = spark.createDataFrame([(1,)], "k bigint")
    got = _rows(E.report(empty, [E.not_null("id"), E.unique("id"),
                                 E.foreign_key("fk", ref, "k")]))
    for r in got.values():
        assert r["n_violations"] == 0 and r["n_rows"] == 0
        assert r["passed"]


def test_agg_between_bounds_and_vacuous_pass(spark, frame):
    """Table-level SLA bounds ride the shared scan: min/max/avg/sum/
    count against [lo, hi]; a NULL aggregate (empty input) violates
    no bound; count polices emptiness instead."""
    got = _rows(E.report(frame, [
        E.agg_between("val", "min", lo=0, name="min_ok_fails"),
        E.agg_between("val", "max", hi=100, name="max_ok"),
        E.agg_between("val", "avg", 0, 50, name="avg_band"),
        E.agg_between("val", "count", lo=3, name="vol_ok"),
        E.agg_between("val", "count", lo=10, name="vol_fails"),
    ]))
    # vals: 5.0, -1.0, 3.0, 99.0, null -> min=-1 (fails lo=0),
    # max=99 (ok), avg=26.5 (in band), count=4
    assert got["min_ok_fails"]["n_violations"] == 1
    assert got["max_ok"]["n_violations"] == 0
    assert got["avg_band"]["n_violations"] == 0
    assert got["vol_ok"]["n_violations"] == 0
    assert got["vol_fails"]["n_violations"] == 1
    assert all(r["n_rows"] == 5 for r in got.values())
    empty = spark.createDataFrame([], "val double")
    got2 = _rows(E.report(empty, [
        E.agg_between("val", "avg", 0, 1, name="vacuous"),
        E.agg_between("val", "count", lo=1, name="must_have_rows"),
    ]))
    assert got2["vacuous"]["passed"]            # NULL avg: no bound hit
    assert not got2["must_have_rows"]["passed"]  # count 0 < 1
    with pytest.raises(ValueError, match="fn"):
        E.agg_between("val", "median", lo=0)
    with pytest.raises(ValueError):
        E.agg_between("val", "avg")


def test_scan_discipline_on_registry_query(spark, sf_dir):
    """10 checks -> exactly 3 scans of orders (row-level, agg-bound
    AND both fk checks share one since r15 -- each fk's broadcast
    key set left-joins onto the shared aggregate scan; unique and
    k-anonymity keep their own groupBy scans) + 2 broadcast customer
    key scans; no sort-merge join anywhere."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.plans.queries import REGISTRY

    df = REGISTRY["data_quality_report"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 5
    assert plan.count("orders.parquet") == 3
    assert plan.count("customer.parquet") == 2
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") == 2
