"""Copy-on-write MERGE on versioned tables (io/versioned
merge_version / delete_keys_version): matched rows replaced or
deleted, unmatched updates inserted, and -- the scale property --
only files whose recorded key stats may contain a matched key are
rewritten; everything else is inherited by reference."""

from __future__ import annotations

import pytest

from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
    SchemaMismatchError, VersionConflictError, _data_files, append_version,
    current_version, delete_keys_version, merge_version, read_current,
    read_version,
)


def _kv(spark, pairs):
    return spark.createDataFrame(pairs, "k bigint, a string")


def _table(spark, tmp_path):
    """Three stats-tracked appends with disjoint key ranges: 0-99 in
    v1's file, 100-199 in v2's, 200-299 in v3's."""
    t = str(tmp_path / "t")
    for lo in (0, 100, 200):
        append_version(
            _kv(spark, [(k, f"old{k}") for k in range(lo, lo + 100)])
            .coalesce(1), t, stats_columns=["k"])
    return t


def test_upsert_replaces_inserts_and_prunes(spark, tmp_path):
    t = _table(spark, tmp_path)
    before = set(_data_files(t, current_version(t)))
    ups = _kv(spark, [(150, "NEW150"), (199, "NEW199"), (999, "NEW999")])
    n = merge_version(spark, t, ups, "k")
    after = _data_files(t, n)
    # only the middle file (range 100-199) was rewritten; the other
    # two original files are inherited verbatim
    kept_old = [f for f in after if f in before]
    assert len(kept_old) == 2
    assert not any(f.startswith("v_00000002/") for f in after)
    rows = {r.k: r.a for r in read_current(spark, t).collect()}
    assert len(rows) == 301  # 300 - 2 replaced + 2 replacements + 1 insert
    assert rows[150] == "NEW150" and rows[199] == "NEW199"
    assert rows[999] == "NEW999"
    assert rows[100] == "old100" and rows[0] == "old0"
    # time travel still sees the pre-merge table
    assert {r.k: r.a for r in read_version(spark, t, 3).collect()}[150] \
        == "old150"


def test_insert_only_merge_rewrites_nothing(spark, tmp_path):
    t = _table(spark, tmp_path)
    before = set(_data_files(t, current_version(t)))
    n = merge_version(spark, t, _kv(spark, [(500, "new")]), "k")
    after = _data_files(t, n)
    assert before < set(after)  # all three old files inherited
    assert read_current(spark, t).count() == 301


def test_delete_keys_prunes_and_deletes(spark, tmp_path):
    t = _table(spark, tmp_path)
    before = set(_data_files(t, current_version(t)))
    keys = spark.createDataFrame([(0,), (7,), (42,)], "k bigint")
    n = delete_keys_version(spark, t, keys, "k")
    after = _data_files(t, n)
    assert len([f for f in after if f in before]) == 2  # v1's file rewritten
    got = {r.k for r in read_current(spark, t).collect()}
    assert len(got) == 297 and not {0, 7, 42} & got


def test_duplicate_update_keys_all_land(spark, tmp_path):
    t = _table(spark, tmp_path)
    ups = _kv(spark, [(5, "x"), (5, "y")])
    merge_version(spark, t, ups, "k")
    vals = sorted(r.a for r in
                  read_current(spark, t).filter("k = 5").collect())
    assert vals == ["x", "y"]


def test_merge_enforces_schema(spark, tmp_path):
    t = _table(spark, tmp_path)
    drifted = spark.createDataFrame([(1, "z", 9)],
                                    "k bigint, a string, extra bigint")
    with pytest.raises(SchemaMismatchError):
        merge_version(spark, t, drifted, "k")
    n = merge_version(spark, t, drifted, "k", merge_schema=True)
    rows = {r.k: (r.a, r.extra) for r in read_current(spark, t).collect()}
    assert rows[1] == ("z", 9) and rows[2] == ("old2", None)
    assert n == current_version(t)


def test_statless_files_conservatively_rewritten(spark, tmp_path):
    """A file without recorded stats on the key may contain anything:
    it must be rewritten, and the merge still lands correctly."""
    t = str(tmp_path / "t")
    append_version(_kv(spark, [(k, f"old{k}") for k in range(50)])
                   .coalesce(1), t)  # NO stats_columns
    n = merge_version(spark, t, _kv(spark, [(10, "NEW")]), "k")
    assert not any(f.startswith("v_00000001/") for f in _data_files(t, n))
    rows = {r.k: r.a for r in read_current(spark, t).collect()}
    assert rows[10] == "NEW" and len(rows) == 50
