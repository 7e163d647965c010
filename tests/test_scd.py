"""Type-2 SCD maintenance (io/scd) over versioned tables.

Reference parity: the reference's dimension-like app tables are
truncate-and-reload with no attribute history (jobs/csr_etl.py:157,
jobs/staging_to_app.py:214-279); scd2_apply is that contract with
history.  Semantics pinned here: new-key insert, null-safe no-op on
unchanged tracked attrs, close+insert on change, close-without-
successor under close_missing, interval non-overlap, as-of reads,
atomicity (one commit per apply), and the determinism guards.
"""

from __future__ import annotations

import pytest

from esg_decarbonization_data_integration_and_data_pipline_spark.io.scd import (
    scd2_apply,
    scd2_as_of,
    scd2_current,
)
from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
    committed_versions,
    current_version,
    read_current,
)

SCHEMA = "k bigint, seg string, bal double"


def _snap(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _hist(spark, td):
    # (key, valid_from) is unique; seg/valid_to may be None and None
    # does not order against str
    return sorted(
        ((r.k, r.seg, r.bal, r.valid_from, r.valid_to, r.is_current)
         for r in read_current(spark, td).collect()),
        key=lambda t: (t[0], t[3]))


def test_init_then_noop_then_change(spark, tmp_path):
    td = str(tmp_path / "dim")
    scd2_apply(spark, td, _snap(spark, [(1, "A", 10.0), (2, "B", 20.0)]),
               "k", ["seg", "bal"], "2023-01-01")
    assert current_version(td) == 1
    # identical snapshot: no rows change, but the commit is still one
    # atomic version (merge of an empty update set)
    scd2_apply(spark, td, _snap(spark, [(1, "A", 10.0), (2, "B", 20.0)]),
               "k", ["seg", "bal"], "2023-02-01")
    assert _hist(spark, td) == [
        (1, "A", 10.0, "2023-01-01", None, True),
        (2, "B", 20.0, "2023-01-01", None, True),
    ]
    scd2_apply(spark, td, _snap(spark, [(1, "A", 15.0), (2, "B", 20.0)]),
               "k", ["seg", "bal"], "2023-03-01")
    assert _hist(spark, td) == [
        (1, "A", 10.0, "2023-01-01", "2023-03-01", False),
        (1, "A", 15.0, "2023-03-01", None, True),
        (2, "B", 20.0, "2023-01-01", None, True),
    ]


def test_new_key_and_close_missing(spark, tmp_path):
    td = str(tmp_path / "dim")
    scd2_apply(spark, td, _snap(spark, [(1, "A", 1.0), (2, "B", 2.0)]),
               "k", ["seg"], "2023-01-01")
    # full-snapshot apply: 2 leaves, 3 arrives
    scd2_apply(spark, td, _snap(spark, [(1, "A", 1.0), (3, "C", 3.0)]),
               "k", ["seg"], "2023-02-01", close_missing=True)
    assert _hist(spark, td) == [
        (1, "A", 1.0, "2023-01-01", None, True),
        (2, "B", 2.0, "2023-01-01", "2023-02-01", False),
        (3, "C", 3.0, "2023-02-01", None, True),
    ]
    cur = sorted(r.k for r in scd2_current(spark, td).collect())
    assert cur == [1, 3]


def test_untracked_column_never_opens_a_version(spark, tmp_path):
    td = str(tmp_path / "dim")
    scd2_apply(spark, td, _snap(spark, [(1, "A", 1.0)]),
               "k", ["seg"], "2023-01-01")
    # bal differs but is untracked: no new version row
    scd2_apply(spark, td, _snap(spark, [(1, "A", 99.0)]),
               "k", ["seg"], "2023-02-01")
    assert _hist(spark, td) == [(1, "A", 1.0, "2023-01-01", None, True)]


def test_null_safe_tracked_comparison(spark, tmp_path):
    td = str(tmp_path / "dim")
    scd2_apply(spark, td, _snap(spark, [(1, None, 1.0)]),
               "k", ["seg"], "2023-01-01")
    # NULL == NULL must be a no-op, not a perpetual reopen
    scd2_apply(spark, td, _snap(spark, [(1, None, 1.0)]),
               "k", ["seg"], "2023-02-01")
    assert len(_hist(spark, td)) == 1
    # NULL -> value is a real change
    scd2_apply(spark, td, _snap(spark, [(1, "A", 1.0)]),
               "k", ["seg"], "2023-03-01")
    assert _hist(spark, td) == [
        (1, None, 1.0, "2023-01-01", "2023-03-01", False),
        (1, "A", 1.0, "2023-03-01", None, True),
    ]


def test_as_of_reads_every_interval(spark, tmp_path):
    td = str(tmp_path / "dim")
    scd2_apply(spark, td, _snap(spark, [(1, "A", 1.0)]),
               "k", ["seg"], "2023-01-01")
    scd2_apply(spark, td, _snap(spark, [(1, "B", 1.0)]),
               "k", ["seg"], "2023-02-01")
    scd2_apply(spark, td, _snap(spark, [(1, "C", 1.0)]),
               "k", ["seg"], "2023-03-01")

    def seg_at(ts):
        rows = scd2_as_of(spark, td, ts).collect()
        assert len(rows) <= 1
        return rows[0].seg if rows else None

    assert seg_at("2022-12-31") is None   # before the member existed
    assert seg_at("2023-01-01") == "A"    # inclusive lower bound
    assert seg_at("2023-01-15") == "A"
    assert seg_at("2023-02-01") == "B"    # exclusive upper bound
    assert seg_at("2023-02-15") == "B"
    assert seg_at("2023-09-09") == "C"    # open row unbounded


def test_each_apply_is_one_commit(spark, tmp_path):
    td = str(tmp_path / "dim")
    for i, eff in enumerate(("2023-01-01", "2023-02-01",
                             "2023-03-01")):
        scd2_apply(spark, td, _snap(spark, [(1, f"S{i}", 1.0)]),
                   "k", ["seg"], eff)
    assert committed_versions(td) == [1, 2, 3]
    # commit time travel is orthogonal to attribute time: version 2
    # holds exactly the first two attribute states
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import read_version

    v2 = sorted((r.seg, r.is_current)
                for r in read_version(spark, td, 2).collect())
    assert v2 == [("S0", False), ("S1", True)]


def test_txn_makes_reapply_exactly_once(spark, tmp_path):
    td = str(tmp_path / "dim")
    scd2_apply(spark, td, _snap(spark, [(1, "A", 1.0)]),
               "k", ["seg"], "2023-01-01", txn="load:1")
    batch = _snap(spark, [(1, "B", 1.0)])
    scd2_apply(spark, td, batch, "k", ["seg"], "2023-02-01",
               txn="load:2")
    # crash-rerun of the same load: marker already visible -> no-op
    scd2_apply(spark, td, batch, "k", ["seg"], "2023-02-01",
               txn="load:2")
    assert committed_versions(td) == [1, 2]
    assert len(_hist(spark, td)) == 2


def test_guards(spark, tmp_path):
    td = str(tmp_path / "dim")
    good = _snap(spark, [(1, "A", 1.0)])
    with pytest.raises(ValueError, match="at least one tracked"):
        scd2_apply(spark, td, good, "k", [], "2023-01-01")
    with pytest.raises(ValueError, match="lacks columns"):
        scd2_apply(spark, td, good, "k", ["nope"], "2023-01-01")
    with pytest.raises(ValueError, match="deterministic"):
        scd2_apply(spark, td, good, "k", ["seg"], None)
    scd2_apply(spark, td, good, "k", ["seg"], "2023-01-01")
    # metadata columns in the batch are managed, not caller-supplied
    with pytest.raises(ValueError, match="metadata columns"):
        scd2_apply(spark, td, read_current(spark, td),
                   "k", ["seg"], "2023-02-01")
    # duplicate business keys would fork history
    with pytest.raises(ValueError, match="duplicate"):
        scd2_apply(spark, td,
                   _snap(spark, [(1, "A", 1.0), (1, "B", 2.0)]),
                   "k", ["seg"], "2023-02-01")
    # equal/out-of-order effective would overlap intervals
    with pytest.raises(ValueError, match="strictly after"):
        scd2_apply(spark, td, _snap(spark, [(1, "B", 1.0)]),
                   "k", ["seg"], "2023-01-01")
    with pytest.raises(ValueError, match="strictly after"):
        scd2_apply(spark, td, _snap(spark, [(1, "B", 1.0)]),
                   "k", ["seg"], "2022-06-01")
    # type drift between applies (str then int) is rejected too
    with pytest.raises(ValueError, match="same type"):
        scd2_apply(spark, td, _snap(spark, [(1, "B", 1.0)]),
                   "k", ["seg"], 99)


def test_scd2_enrich_point_in_time(spark, tmp_path):
    """Fact rows resolve the dimension row covering THEIR OWN date:
    pre-history and post-departure facts keep NULL dim columns."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.scd import scd2_enrich

    td = str(tmp_path / "dim")
    scd2_apply(spark, td, _snap(spark, [(1, "A", 1.0)]),
               "k", ["seg"], "2023-01-01")
    scd2_apply(spark, td, _snap(spark, [(1, "B", 1.0)]),
               "k", ["seg"], "2023-02-01")
    scd2_apply(spark, td, _snap(spark, []).limit(0),
               "k", ["seg"], "2023-03-01", close_missing=True)
    facts = spark.createDataFrame(
        [(1, "2022-12-31", 10.0), (1, "2023-01-15", 20.0),
         (1, "2023-02-15", 30.0), (1, "2023-03-15", 40.0)],
        "k bigint, ts string, amt double")
    hist = read_current(spark, td)
    got = {r.ts: r.seg for r in
           scd2_enrich(facts, hist, "k", "ts").collect()}
    assert got == {"2022-12-31": None, "2023-01-15": "A",
                   "2023-02-15": "B", "2023-03-15": None}
    # inner join drops the uncovered facts instead
    assert scd2_enrich(facts, hist, "k", "ts", how="inner").count() == 2
    with pytest.raises(ValueError, match="facts need columns"):
        scd2_enrich(facts.drop("ts"), hist, "k", "ts")


def test_monotonicity_guard_survives_full_departure(spark, tmp_path):
    """An all-departed dimension (every row closed) must still reject
    an out-of-order effective -- the guard reads the whole table's
    max valid_from, not just the open rows."""
    td = str(tmp_path / "dim")
    scd2_apply(spark, td, _snap(spark, [(1, "A", 1.0)]),
               "k", ["seg"], "2023-01-01")
    scd2_apply(spark, td, _snap(spark, []).limit(0),
               "k", ["seg"], "2023-02-01", close_missing=True)
    assert scd2_current(spark, td).count() == 0
    with pytest.raises(ValueError, match="strictly after"):
        scd2_apply(spark, td, _snap(spark, [(1, "B", 1.0)]),
                   "k", ["seg"], "2023-01-15")
    # and the member's return at a later effective reopens cleanly
    scd2_apply(spark, td, _snap(spark, [(1, "B", 1.0)]),
               "k", ["seg"], "2023-03-01")
    assert _hist(spark, td) == [
        (1, "A", 1.0, "2023-01-01", "2023-02-01", False),
        (1, "B", 1.0, "2023-03-01", None, True),
    ]


def test_integer_effective_epochs(spark, tmp_path):
    td = str(tmp_path / "dim")
    scd2_apply(spark, td, _snap(spark, [(1, "A", 1.0)]),
               "k", ["seg"], 100)
    scd2_apply(spark, td, _snap(spark, [(1, "B", 1.0)]),
               "k", ["seg"], 200)
    assert _hist(spark, td) == [
        (1, "A", 1.0, 100, 200, False),
        (1, "B", 1.0, 200, None, True),
    ]
    assert [r.seg for r in scd2_as_of(spark, td, 150).collect()] == ["A"]


def test_interval_invariants_hold_after_many_applies(spark, tmp_path):
    """Non-overlap + exactly-one-current per surviving key, checked
    mechanically after a mixed sequence of changes/arrivals/
    departures."""
    td = str(tmp_path / "dim")
    snaps = [
        ("2023-01-01", [(1, "A", 1.0), (2, "B", 2.0)], False),
        ("2023-02-01", [(1, "A2", 1.0), (2, "B", 2.0), (3, "C", 3.0)],
         False),
        ("2023-03-01", [(1, "A3", 1.0), (3, "C", 3.5)], True),  # 2 leaves
        ("2023-04-01", [(1, "A3", 1.0), (2, "B9", 9.0), (3, "C", 3.5)],
         False),  # 2 returns
    ]
    for eff, rows, close in snaps:
        scd2_apply(spark, td, _snap(spark, rows), "k", ["seg", "bal"],
                   eff, close_missing=close)
    hist = _hist(spark, td)
    by_key: dict = {}
    for k, _seg, _bal, vf, vt, cur in hist:
        by_key.setdefault(k, []).append((vf, vt, cur))
    for k, rows in by_key.items():
        rows.sort()
        assert sum(1 for _vf, _vt, cur in rows if cur) <= 1
        for (vf, vt, _c), (vf2, _vt2, _c2) in zip(rows, rows[1:]):
            assert vt is not None and vt <= vf2, (
                f"overlapping intervals for key {k}: {rows}")
    # key 2's comeback: closed span, then a fresh open row
    assert [(vf, vt) for vf, vt, _ in by_key[2]] == [
        ("2023-01-01", "2023-03-01"), ("2023-04-01", None)]
