"""Partial compaction (io/versioned.compact_where): only the
stats-overlapping slice is rewritten and re-clustered; the rest of
the table inherits by reference, and the commit stays row-identical
(CDF fast path survives)."""

from __future__ import annotations

import os

import pytest

from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
    _data_files,
    _read_stats,
    append_version,
    compact_where,
    current_version,
    read_changes,
    read_current,
    read_where,
    table_rowcount,
)


def _kv(spark, pairs):
    return spark.createDataFrame(pairs, "k bigint, a string")


def _frag_table(spark, tmp_path):
    """Six fragmented appends: keys 0-49 scattered across four small
    files (two appends split in two), keys 100-199 in two clean
    files -- the 'last ingest days are fragmented' shape."""
    t = str(tmp_path / "t")
    for lo, parts in ((100, 1), (150, 1), (0, 2), (10, 2),
                      (20, 1), (35, 1)):
        size = 50 if lo >= 100 else (10 if lo < 30 else 15)
        append_version(
            _kv(spark, [(k, f"a{k}") for k in range(lo, lo + size)])
            .repartition(parts), t, stats_columns=["k"])
    return t


def test_compact_where_rewrites_only_the_slice(spark, tmp_path):
    t = _frag_table(spark, tmp_path)
    before = _data_files(t, current_version(t))
    clean = [f for f in before
             if _read_stats(t, current_version(t))[f]["k"][0] >= 100]
    assert len(clean) == 2
    n = compact_where(spark, t, "k", lo=0, hi=60,
                      target_file_bytes=1 << 30)
    after = _data_files(t, n)
    # the two >=100 files survive verbatim; the fragmented low slice
    # collapsed into one clustered file
    assert set(clean) <= set(after)
    assert len(after) == 3
    # content identical (fixture keys: 0-29, 35-49, 100-199)
    expect = sorted(list(range(30)) + list(range(35, 50))
                    + list(range(100, 200)))
    rows = sorted(r.k for r in read_current(spark, t).collect())
    assert rows == expect
    # fresh stats on the rewritten slice keep skipping working
    got = read_where(spark, t, "k", lo=5, hi=12)
    assert sorted(r.k for r in got.collect()) == list(range(5, 13))
    assert table_rowcount(t, n) == len(expect)


def test_compact_where_is_row_identical_for_cdf(spark, tmp_path):
    t = _frag_table(spark, tmp_path)
    base = current_version(t)
    n = compact_where(spark, t, "k", lo=0, hi=60)
    # the delta across a partial compaction is EMPTY and answered
    # without a row-level diff (the #base link splits the interval)
    assert read_changes(spark, t, base, n).count() == 0
    # ...and an append after it diffs as exactly the new rows
    append_version(_kv(spark, [(500, "new")]), t)
    delta = read_changes(spark, t, base, None).collect()
    assert [(r.k, r._change_type) for r in delta] == [(500, "insert")]


def test_compact_where_noop_and_validation(spark, tmp_path):
    t = _frag_table(spark, tmp_path)
    base = current_version(t)
    assert compact_where(spark, t, "k", lo=9000, hi=9999) is None
    assert current_version(t) == base
    with pytest.raises(ValueError, match="lo and/or hi"):
        compact_where(spark, t, "k")
    with pytest.raises(FileNotFoundError):
        compact_where(spark, str(tmp_path / "nope"), "k", lo=0)


def test_statless_files_conservatively_included(spark, tmp_path):
    t = str(tmp_path / "t")
    # first append WITHOUT stats tracking: unknowable range
    append_version(_kv(spark, [(1, "x")]).coalesce(1), t)
    append_version(_kv(spark, [(200, "y")]).coalesce(1), t,
                   stats_columns=["k"])
    n = compact_where(spark, t, "k", lo=150, hi=250)
    after = _data_files(t, n)
    # the stat-less file had to be rewritten too (could contain
    # anything); the slice file as well -> everything re-clustered
    rows = sorted((r.k, r.a) for r in read_current(spark, t).collect())
    assert rows == [(1, "x"), (200, "y")]
    # rewritten layout now carries stats for k on every file
    stats = _read_stats(t, n)
    assert all("k" in stats.get(f, {}) for f in after)


def test_compact_where_validates_col_and_demands_stats(spark,
                                                       tmp_path):
    t = str(tmp_path / "t")
    append_version(_kv(spark, [(1, "x")]).coalesce(1), t,
                   stats_columns=["k"])
    with pytest.raises(ValueError, match="not in the current schema"):
        compact_where(spark, t, "nope", lo=0)
    with pytest.raises(ValueError, match="not in the current schema"):
        compact_where(spark, t, "k", lo=0, sort_by=["nope"])
    # a real column with NO recorded stats anywhere: refuse instead
    # of silently degrading to the full-table rewrite
    with pytest.raises(ValueError, match="no file records stats"):
        compact_where(spark, t, "a", lo="a")
