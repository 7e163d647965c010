"""Property test: expectations.report against a brute-force Python
model on random frames (random nulls, duplicates, out-of-range and
out-of-set values, missing fk keys) -- every kind, every count, one
invariant layer the scan-count pins can't give.
"""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings, strategies as st

from esg_decarbonization_data_integration_and_data_pipline_spark.operators import expectations as E


# long-tail suite: skipped by the default run (pytest.ini addopts -m "not slow");
# select with `-m slow`
pytestmark = pytest.mark.slow

SETTINGS = settings(max_examples=10, deadline=None,
                    suppress_health_check=[
                        HealthCheck.function_scoped_fixture])

row = st.tuples(
    st.one_of(st.none(), st.integers(0, 4)),            # id
    st.one_of(st.none(), st.sampled_from("abcz")),      # cat
    st.one_of(st.none(),
              st.floats(-50, 150, allow_nan=False)),    # val
    st.one_of(st.none(), st.integers(0, 6)),            # fk
)


def _model(rows, ref_keys):
    ids = [r[0] for r in rows]
    from collections import Counter
    idc = Counter(i for i in ids if i is not None)
    catc = Counter((r[0], r[1]) for r in rows)
    vals = [r[2] for r in rows if r[2] is not None]
    return {
        "not_null:id": sum(1 for i in ids if i is None),
        "in_range:val": sum(1 for r in rows
                            if r[2] is not None
                            and not (0 <= r[2] <= 100)),
        "in_set:cat": sum(1 for r in rows
                          if r[1] is not None and r[1] not in "ab"),
        "unique:id": sum(c for i, c in idc.items() if c > 1),
        "mgs": sum(c for c in catc.values() if c < 2),
        "foreign_key:fk": sum(1 for r in rows
                              if r[3] is not None
                              and r[3] not in ref_keys),
        # agg bounds: 1 when the bound fails; NULL agg passes
        "agg_max": int(bool(vals) and max(vals) > 100),
        "agg_cnt": int(len(vals) < 2),
    }


@SETTINGS
@given(rows=st.lists(row, min_size=1, max_size=15),
       ref_keys=st.frozensets(st.integers(0, 6), max_size=5))
def test_report_matches_python_model(spark, rows, ref_keys):
    df = spark.createDataFrame(
        rows, "id bigint, cat string, val double, fk bigint")
    ref = spark.createDataFrame(
        [(k,) for k in ref_keys] or [(None,)], "k bigint")
    got = {r["check_name"]: r for r in E.report(df, [
        E.not_null("id"),
        E.in_range("val", 0.0, 100.0),
        E.in_set("cat", ["a", "b"]),
        E.unique("id"),
        E.min_group_size(("id", "cat"), 2, name="mgs"),
        E.foreign_key("fk", ref, "k"),
        E.agg_between("val", "max", hi=100.0, name="agg_max"),
        E.agg_between("val", "count", lo=2, name="agg_cnt"),
    ]).collect()}
    want = _model(rows, ref_keys)
    for name, viol in want.items():
        assert got[name]["n_violations"] == viol, name
        assert got[name]["n_rows"] == len(rows), name
        assert got[name]["passed"] == (viol == 0), name
