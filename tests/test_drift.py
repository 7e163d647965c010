"""Distribution drift between snapshots (operators/diff.psi_drift /
category_drift): zero drift on identical snapshots, hand-computed
PSI terms on a shifted mix, end-bucket clamping of out-of-range new
values, the NULL bucket, degenerate reference ranges, and the
categorical variant's in-plan smoothing domain.
"""

from __future__ import annotations

import math

import pytest

from esg_decarbonization_data_integration_and_data_pipline_spark.operators.diff import (
    category_drift, psi_drift,
)


def _num(spark, xs):
    return spark.createDataFrame([(float(x),) if x is not None
                                  else (None,) for x in xs],
                                 "x double")


def test_psi_identical_snapshots_zero_everywhere(spark):
    old = _num(spark, [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, None])
    got = psi_drift(old, old, "x", n_buckets=5).collect()
    assert len(got) == 6  # 5 value buckets + the null bucket
    assert all(r["psi_term"] == 0.0 for r in got)
    assert all(r["p_old"] == r["p_new"] for r in got)
    assert {r["bucket"] for r in got} == {-1, 0, 1, 2, 3, 4}


def test_psi_hand_computed_shift_and_clamping(spark):
    """old = uniform on [0, 10); new values below/above the old
    range clamp into buckets 0 / n-1; terms match the closed form."""
    old = _num(spark, [0, 1, 2, 3, 4, 5, 6, 7, 8, 9])
    new = _num(spark, [-5, -5, 20, 20, 20, 5])
    got = {r["bucket"]: r for r in
           psi_drift(old, new, "x", n_buckets=2).collect()}
    # old: bucket0 = [0,4.5) -> 5, bucket1 -> 5. new: -5 clamps to 0
    # (x2), 20 clamps to 1 (x3), 5 -> floor((5-0)*2/9)=1 -> bucket 1
    assert (got[0]["n_old"], got[0]["n_new"]) == (5, 2)
    assert (got[1]["n_old"], got[1]["n_new"]) == (5, 4)
    k = 3.0  # n_buckets + 1
    for b in (0, 1):
        p = (got[b]["n_old"] + 1) / (10 + k)
        q = (got[b]["n_new"] + 1) / (6 + k)
        assert got[b]["psi_term"] == pytest.approx(
            round((q - p) * math.log(q / p), 6), abs=2e-6)
        assert got[b]["psi_term"] > 0
    assert -1 not in got  # no nulls anywhere -> no null bucket row


def test_psi_null_bucket_and_degenerate_range(spark):
    old = _num(spark, [7, 7, 7, None])
    new = _num(spark, [7, None, None])
    got = {r["bucket"]: r for r in
           psi_drift(old, new, "x", n_buckets=4).collect()}
    # min == max -> every non-null value lands in bucket 0
    assert (got[0]["n_old"], got[0]["n_new"]) == (3, 1)
    assert (got[-1]["n_old"], got[-1]["n_new"]) == (1, 2)
    assert got[-1]["psi_term"] > 0
    with pytest.raises(ValueError):
        psi_drift(old, new, "x", n_buckets=0)


def test_psi_empty_or_allnull_reference_raises(spark):
    """PSI against an undefined reference distribution must be loud,
    not a plausible-looking number with everything clamped into
    bucket 0."""
    new = _num(spark, [1, 2, 3])
    with pytest.raises(ValueError, match="reference"):
        psi_drift(_num(spark, []), new, "x")
    with pytest.raises(ValueError, match="reference"):
        psi_drift(_num(spark, [None, None]), new, "x")


def test_category_drift_values_nulls_and_smoothing_domain(spark):
    def cat(xs):
        return spark.createDataFrame([(x,) for x in xs], "c string")

    old = cat(["a", "a", "b", None])
    new = cat(["a", "c", "c", None, ""])
    got = {r["category"]: r for r in
           category_drift(old, new, "c").collect()}
    # domain across both: a, b, c, "", null -> k = 5
    assert set(got) == {"a", "b", "c", "", None}
    assert (got["a"]["n_old"], got["a"]["n_new"]) == (2, 1)
    assert (got["b"]["n_old"], got["b"]["n_new"]) == (1, 0)
    assert (got[""]["n_old"], got[""]["n_new"]) == (0, 1)
    assert (got[None]["n_old"], got[None]["n_new"]) == (1, 1)
    k = 5.0
    p = (2 + 1) / (4 + k)
    q = (1 + 1) / (5 + k)
    assert got["a"]["psi_term"] == pytest.approx(
        round((q - p) * math.log(q / p), 6), abs=2e-6)
    # empty string and NULL are distinct buckets with distinct counts
    assert got[""]["n_old"] == 0 and got[None]["n_old"] == 1


def test_category_drift_identical_is_zero(spark):
    df = spark.createDataFrame([("a",), ("b",), (None,)], "c string")
    got = category_drift(df, df, "c").collect()
    assert all(r["psi_term"] == 0.0 for r in got)


def test_psi_total_orders_is_small_between_adjacent_years(spark,
                                                          sf_dir):
    """Sanity on fixtures: 1997 vs 1998 order prices come from the
    same generator, so headline PSI must be far under the 0.1
    'stable' rule of thumb -- and the registry query agrees with
    the operator."""
    from pyspark.sql import functions as F
    from esg_decarbonization_data_integration_and_data_pipline_spark.plans.queries import REGISTRY

    df = REGISTRY["drift_orders_psi"].fn(spark, sf_dir)
    total = df.agg(F.sum("psi_term")).collect()[0][0]
    assert 0 <= total < 0.1


def test_schema_diff_classifies_and_ignores_nullability(spark):
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.diff import schema_diff

    old = spark.createDataFrame([], "a bigint, b string, c double")
    new = spark.createDataFrame([], "a int, b string, d string")
    got = schema_diff(old, new)
    assert got == [
        {"column": "a", "status": "type_changed",
         "old_type": "bigint", "new_type": "int"},
        {"column": "c", "status": "removed",
         "old_type": "double", "new_type": None},
        {"column": "d", "status": "added",
         "old_type": None, "new_type": "string"},
    ]
    assert schema_diff(old, old) == []
    # nullability-only differences are not drift
    from pyspark.sql.types import LongType, StructField, StructType
    n1 = spark.createDataFrame(
        [], StructType([StructField("a", LongType(), True)]))
    n2 = spark.createDataFrame(
        [], StructType([StructField("a", LongType(), False)]))
    assert schema_diff(n1, n2) == []


from hypothesis import HealthCheck, given, settings, strategies as st

_vals = st.one_of(st.none(),
                  st.floats(-20, 20, allow_nan=False, width=64))


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(old=st.lists(_vals, min_size=1, max_size=12),
       new=st.lists(_vals, max_size=12),
       n_buckets=st.integers(1, 5))
def test_psi_matches_python_model(spark, old, new, n_buckets):
    """Bucket assignment (identical IEEE arithmetic), counts, and
    smoothed PSI terms match a brute-force Python model on random
    inputs -- including clamping, the null bucket, degenerate
    ranges, and the no-reference raise."""
    o_nonnull = [x for x in old if x is not None]
    odf, ndf = _num(spark, old), _num(spark, new)
    if not o_nonnull:
        with pytest.raises(ValueError, match="reference"):
            psi_drift(odf, ndf, "x", n_buckets=n_buckets)
        return
    lo, hi = min(o_nonnull), max(o_nonnull)

    def bucket(x):
        if x is None:
            return -1
        if hi == lo:
            return 0
        raw = ((x - lo) * n_buckets) / (hi - lo)
        if math.isinf(raw):
            # a subnormal range width overflows the double division;
            # the engine's floor(inf) saturates to Long.MAX and
            # least() clamps to the top bucket (probed on Spark 4.1)
            return n_buckets - 1 if raw > 0 else 0
        return int(min(n_buckets - 1,
                       max(0, math.floor(raw))))

    from collections import Counter
    oc, nc = Counter(map(bucket, old)), Counter(map(bucket, new))
    k = float(n_buckets + 1)
    got = {r["bucket"]: r for r in
           psi_drift(odf, ndf, "x", n_buckets=n_buckets).collect()}
    assert set(got) == set(oc) | set(nc)
    for b, r in got.items():
        assert (r["n_old"], r["n_new"]) == (oc.get(b, 0), nc.get(b, 0))
        p = (oc.get(b, 0) + 1.0) / (len(old) + k)
        q = (nc.get(b, 0) + 1.0) / (len(new) + k)
        assert r["psi_term"] == pytest.approx(
            round((q - p) * math.log(q / p), 6), abs=2e-6)


def test_drift_summary_psi_total_and_bucket_ks(spark):
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.diff import drift_summary

    old = _num(spark, [0, 1, 2, 3, 4, 5, 6, 7, 8, 9])
    # shift everything to the top of old's range
    new = _num(spark, [9, 9, 9, 9])
    d = psi_drift(old, new, "x", n_buckets=2)
    row = drift_summary(d).collect()[0]
    # CDF at bucket 0: old 0.5, new 0.0 -> KS = 0.5 exactly
    assert row["ks_approx"] == pytest.approx(0.5, abs=1e-9)
    want_psi = round(sum(r["psi_term"] for r in d.collect()), 6)
    assert row["psi_total"] == pytest.approx(want_psi, abs=2e-6)
    # identical snapshots: zero both ways
    same = drift_summary(psi_drift(old, old, "x", n_buckets=4))
    r2 = same.collect()[0]
    assert r2["psi_total"] == 0.0 and r2["ks_approx"] == 0.0
    # one side all-null/empty of values -> ks NULL, psi still real
    allnull = _num(spark, [None, None])
    r3 = drift_summary(psi_drift(old, allnull, "x", 2)).collect()[0]
    assert r3["ks_approx"] is None
    assert r3["psi_total"] > 0


def test_category_drift_summary_psi_and_tvd(spark):
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.diff import (
        category_drift_summary,
    )

    def cat(xs):
        return spark.createDataFrame([(x,) for x in xs], "c string")

    old = cat(["a", "a", "b", "b"])
    new = cat(["a", "c", "c", "c"])
    d = category_drift(old, new, "c")
    row = category_drift_summary(d).collect()[0]
    # raw proportions: old a=.5 b=.5 c=0; new a=.25 b=0 c=.75
    # TVD = 0.5 * (|.5-.25| + |.5-0| + |0-.75|) = 0.75
    assert row["tvd"] == pytest.approx(0.75, abs=1e-9)
    want_psi = round(sum(r["psi_term"] for r in d.collect()), 6)
    assert row["psi_total"] == pytest.approx(want_psi, abs=2e-6)
    same = category_drift_summary(category_drift(old, old, "c"))
    r2 = same.collect()[0]
    assert r2["psi_total"] == 0.0 and r2["tvd"] == 0.0


def test_category_drift_overcap_fallback_matches_local(spark,
                                                       monkeypatch):
    """The r16 driver-merge path (one union job, local scoring) and
    the executor-resident checkpoint fallback (key domain above the
    transfer cap) must produce identical frames -- the fallback is
    the 100 TB safety valve for a non-control-plane-sized category
    domain, not a different operator."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators import diff

    def cat(xs):
        return spark.createDataFrame([(x,) for x in xs], "c string")

    old = cat(["a", "a", "b", None, "d"])
    new = cat(["a", "c", "c", None, "", "d", "d"])
    local = {r["category"]: r for r in
             category_drift(old, new, "c").collect()}
    monkeypatch.setattr(diff, "_LOCAL_COUNTS_CAP", 1)
    fallback = {r["category"]: r for r in
                category_drift(old, new, "c").collect()}
    assert set(local) == set(fallback)
    for k in local:
        assert tuple(local[k]) == tuple(fallback[k]), k


def test_psi_drift_plan_has_no_exchange_or_scan(spark):
    """r16 contract: the PSI frame is a projection over ONE local
    frame -- the corpus is scanned exactly once per side inside the
    counts job, and the returned plan carries no join/aggregate
    exchanges and no rescan of the inputs (the r15 plans re-derived
    the bucket-count subtree per consumer; guide section 2.4)."""
    old = _num(spark, [1, 2, 3, 4, None])
    new = _num(spark, [2, 3, 5])
    plan = (psi_drift(old, new, "x", n_buckets=4)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
    assert "Scan parquet" not in plan
