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


def test_consume_changes_cursor_lifecycle(spark, tmp_path):
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
        consume_changes,
    )

    t = str(tmp_path / "t")
    cursor = str(tmp_path / "cursor")
    append_version(_kv(spark, [(1, "a")]), t)
    append_version(_kv(spark, [(2, "b")]), t)
    # first call: whole table as inserts; not acked -> re-delivered
    ch1, ack1 = consume_changes(spark, t, cursor)
    assert _rows(ch1) == [(1, "a", "insert"), (2, "b", "insert")]
    ch1b, ack1b = consume_changes(spark, t, cursor)
    assert _rows(ch1b) == _rows(ch1)  # at-least-once: crash = replay
    assert ack1b() == 2
    # acked: nothing new
    ch2, ack2 = consume_changes(spark, t, cursor)
    assert ch2.count() == 0
    ack2()
    # new commits deliver exactly the delta
    append_version(_kv(spark, [(3, "c")]), t)
    ch3, ack3 = consume_changes(spark, t, cursor)
    assert _rows(ch3) == [(3, "c", "insert")]
    ack3()


def test_describe_table_metadata_only(spark, tmp_path):
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
        describe_table,
    )

    t = str(tmp_path / "t")
    append_version(_kv(spark, [(1, "a")]).coalesce(1), t,
                   stats_columns=["k"], txn="t1")
    append_version(_kv(spark, [(2, "b")]).coalesce(1), t, txn="t2")
    d = describe_table(t)
    assert d["current"] == 2 and d["committed"] == 2
    assert d["readable"] == 2 and d["n_files"] == 2
    assert d["schema"] == ["k", "v"] and d["stats_columns"] == ["k"]
    assert d["txns"] == 2 and d["bytes"] > 0


def test_uncommitted_version_rejected(spark, tmp_path):
    t = str(tmp_path / "t")
    append_version(_kv(spark, [(1, "a")]), t)
    with pytest.raises(ValueError, match="never committed"):
        read_changes(spark, t, 7)


def test_changes_across_compaction_stay_on_fast_paths(spark,
                                                      tmp_path):
    """r9 review finding #5: a compaction between from and to used to
    force the row-level multiset diff (two full scans).  The
    compaction's #base manifest link now splits the delta into
    neighbouring segments, each an append fast path -- pinned by
    asserting the PLAN contains no join/aggregate (the slow diff is a
    full-outer join over canonicalized counts)."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
        append_version, compact_table, read_changes,
    )

    t = str(tmp_path / "t")

    def df(xs):
        return spark.createDataFrame([(int(x),) for x in xs],
                                     "x bigint")

    append_version(df([1, 2]), t)            # v1
    append_version(df([3]), t)               # v2
    compact_table(spark, t)                  # v3 (rows == v2)
    append_version(df([4]), t)               # v4
    ch = read_changes(spark, t, 1, 4)
    rows = sorted((r.x, r._change_type) for r in ch.collect())
    assert rows == [(3, "insert"), (4, "insert")]
    plan = ch._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Aggregate" not in plan
    # compaction-to-compaction and from==base edges stay exact
    compact_table(spark, t)                  # v5 (rows == v4)
    assert read_changes(spark, t, 4, 5).count() == 0
    assert sorted(r.x for r in
                  read_changes(spark, t, 3, 5).collect()) == [4]
    # nested: two compactions inside one interval
    append_version(df([5]), t)               # v6
    got = sorted(r.x for r in read_changes(spark, t, 1, 6).collect())
    assert got == [3, 4, 5]
    plan2 = (read_changes(spark, t, 1, 6)
             ._jdf.queryExecution().executedPlan().toString())
    assert "Join" not in plan2 and "Aggregate" not in plan2
