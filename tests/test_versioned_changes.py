"""Change-data-feed reads on versioned tables (io/versioned
read_changes): append chains use the exact file-level fast path,
merges/compactions fall back to a row-level multiset diff, and a
compaction that changed nothing diffs empty."""

from __future__ import annotations

import pytest

from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
    append_version, compact_table, delete_keys_version, merge_version,
    read_changes,
)


def _kv(spark, pairs):
    return spark.createDataFrame(pairs, "k bigint, v string")


def _rows(df):
    return sorted((r.k, r.v, r._change_type) for r in df.collect())


def test_append_chain_fast_path(spark, tmp_path):
    t = str(tmp_path / "t")
    append_version(_kv(spark, [(1, "a")]), t)
    append_version(_kv(spark, [(2, "b")]), t)
    append_version(_kv(spark, [(3, "c")]), t)
    assert _rows(read_changes(spark, t, 1)) == \
        [(2, "b", "insert"), (3, "c", "insert")]
    assert _rows(read_changes(spark, t, 2, 3)) == [(3, "c", "insert")]
    assert read_changes(spark, t, 3, 3).count() == 0


def test_merge_produces_delete_plus_insert(spark, tmp_path):
    t = str(tmp_path / "t")
    append_version(_kv(spark, [(1, "a"), (2, "b")]).coalesce(1), t,
                   stats_columns=["k"])
    merge_version(spark, t, _kv(spark, [(2, "B2"), (9, "new")]), "k")
    got = _rows(read_changes(spark, t, 1))
    assert got == [(2, "B2", "insert"), (2, "b", "delete"),
                   (9, "new", "insert")]


def test_delete_only_changes(spark, tmp_path):
    t = str(tmp_path / "t")
    append_version(_kv(spark, [(1, "a"), (2, "b"), (3, "c")])
                   .coalesce(1), t, stats_columns=["k"])
    delete_keys_version(spark, t,
                        spark.createDataFrame([(2,)], "k bigint"), "k")
    assert _rows(read_changes(spark, t, 1)) == [(2, "b", "delete")]


def test_compaction_diffs_empty(spark, tmp_path):
    t = str(tmp_path / "t")
    append_version(_kv(spark, [(1, "a")]), t)
    append_version(_kv(spark, [(2, "b")]), t)
    compact_table(spark, t)
    assert read_changes(spark, t, 2).count() == 0
    # and across the compaction boundary the delta is still exact
    assert _rows(read_changes(spark, t, 1)) == [(2, "b", "insert")]


def test_duplicate_row_multiplicity(spark, tmp_path):
    t = str(tmp_path / "t")
    append_version(_kv(spark, [(1, "same")]), t)
    append_version(_kv(spark, [(1, "same"), (1, "same")]), t)
    compact_table(spark, t)
    # v1 -> v2 is an append pair: exact via the file fast path
    assert _rows(read_changes(spark, t, 1, 2)) == \
        [(1, "same", "insert"), (1, "same", "insert")]
    # v1 -> v3 crosses the compaction (file sets disjoint): the
    # ROW-LEVEL tier must reproduce the same multiset delta
    assert _rows(read_changes(spark, t, 1, 3)) == \
        [(1, "same", "insert"), (1, "same", "insert")]


def test_uncommitted_version_rejected(spark, tmp_path):
    t = str(tmp_path / "t")
    append_version(_kv(spark, [(1, "a")]), t)
    with pytest.raises(ValueError, match="never committed"):
        read_changes(spark, t, 7)
