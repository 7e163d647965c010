"""Schema enforcement and evolution on versioned tables
(io/versioned): every version commits with a pinned read schema
(_SCHEMA.json), appends are schema-checked against the CURRENT base
(Delta-style enforcement by default, additive evolution with
merge_schema=True), and time-travel returns each version under the
schema it committed with -- old files surface evolved columns as NULL
without any read-time footer merge.
"""

from __future__ import annotations

import os

import pytest

from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
    SchemaMismatchError, append_version, compact_table, current_version,
    history, read_current, read_version, table_schema, write_version,
)


def _kv(spark, rows, schema="k bigint, a string"):
    return spark.createDataFrame(rows, schema)


def test_append_enforces_schema_by_default(spark, tmp_path):
    t = str(tmp_path / "t")
    append_version(_kv(spark, [(1, "x")]), t)
    with pytest.raises(SchemaMismatchError, match="merge_schema=True"):
        append_version(
            _kv(spark, [(2, "y", 7)], "k bigint, a string, b bigint"), t)
    # the rejected batch left nothing visible: current still v1,
    # history one entry, schema unchanged
    assert current_version(t) == 1
    assert len(history(t)) == 1
    assert [f.name for f in table_schema(t, 1).fields] == ["k", "a"]


def test_merge_schema_adds_nullable_column(spark, tmp_path):
    t = str(tmp_path / "t")
    append_version(_kv(spark, [(1, "x")]), t)
    append_version(
        _kv(spark, [(2, "y", 7)], "k bigint, a string, b bigint"), t,
        merge_schema=True)
    cur = read_current(spark, t)
    assert [f.name for f in cur.schema.fields] == ["k", "a", "b"]
    rows = {r.k: (r.a, r.b) for r in cur.collect()}
    # pre-evolution file reads NULL for the added column
    assert rows == {1: ("x", None), 2: ("y", 7)}


def test_time_travel_keeps_each_versions_schema(spark, tmp_path):
    """read_version(n) returns the schema v_n COMMITTED with: the
    pre-evolution snapshot has no 'b', even though the table does."""
    t = str(tmp_path / "t")
    append_version(_kv(spark, [(1, "x")]), t)
    append_version(
        _kv(spark, [(2, "y", 7)], "k bigint, a string, b bigint"), t,
        merge_schema=True)
    assert [f.name for f in read_version(spark, t, 1).schema.fields] \
        == ["k", "a"]
    assert [f.name for f in read_version(spark, t, 2).schema.fields] \
        == ["k", "a", "b"]


def test_type_conflict_never_merges(spark, tmp_path):
    t = str(tmp_path / "t")
    append_version(_kv(spark, [(1, "x")]), t)
    with pytest.raises(SchemaMismatchError, match="type conflict"):
        append_version(_kv(spark, [(2, 3)], "k bigint, a bigint"), t,
                       merge_schema=True)


def test_merge_schema_tolerates_missing_columns(spark, tmp_path):
    """Evolution is symmetric: a batch missing a base column appends
    fine under merge_schema, its rows reading NULL there."""
    t = str(tmp_path / "t")
    append_version(_kv(spark, [(1, "x")]), t)
    append_version(_kv(spark, [(9,)], "k bigint"), t, merge_schema=True)
    rows = {r.k: r.a for r in read_current(spark, t).collect()}
    assert rows == {1: "x", 9: None}


def test_compaction_preserves_evolved_schema(spark, tmp_path):
    t = str(tmp_path / "t")
    append_version(_kv(spark, [(1, "x")]), t)
    append_version(
        _kv(spark, [(2, "y", 7)], "k bigint, a string, b bigint"), t,
        merge_schema=True)
    n = compact_table(spark, t)
    assert [f.name for f in table_schema(t, n).fields] == ["k", "a", "b"]
    rows = {r.k: (r.a, r.b) for r in read_current(spark, t).collect()}
    assert rows == {1: ("x", None), 2: ("y", 7)}
    # and the snapshot keeps enforcing: a post-compaction drifted
    # append is still rejected
    with pytest.raises(SchemaMismatchError):
        append_version(_kv(spark, [(3, "z")], "k bigint, z string"), t)


def test_write_version_snapshot_changes_schema_freely(spark, tmp_path):
    """write_version is a full replacement -- the documented path for
    incompatible schema changes (e.g. a column type rewrite)."""
    t = str(tmp_path / "t")
    append_version(_kv(spark, [(1, "x")]), t)
    write_version(_kv(spark, [(1, 10)], "k bigint, a bigint"), t)
    assert read_current(spark, t).schema["a"].dataType.simpleString() \
        == "bigint"
    # appends now enforce against the NEW schema
    with pytest.raises(SchemaMismatchError):
        append_version(_kv(spark, [(2, "y")]), t)
    append_version(_kv(spark, [(2, 20)], "k bigint, a bigint"), t)
    assert {r.k: r.a for r in read_current(spark, t).collect()} \
        == {1: 10, 2: 20}


def test_legacy_version_without_schema_file_still_appends(spark, tmp_path):
    """Pre-schema-pinning tables (no _SCHEMA.json) keep working: the
    commit path falls back to the base's parquet footers once, and
    the next version commits pinned."""
    t = str(tmp_path / "t")
    append_version(_kv(spark, [(1, "x")]), t)
    os.remove(os.path.join(t, "v_00000001", "_SCHEMA.json"))
    assert table_schema(t, 1) is None
    append_version(_kv(spark, [(2, "y")]), t)  # footer-fallback check
    assert [f.name for f in table_schema(t, 2).fields] == ["k", "a"]
    assert {r.k for r in read_current(spark, t).collect()} == {1, 2}
    with pytest.raises(SchemaMismatchError):
        append_version(_kv(spark, [(3,)], "k bigint"), t)
