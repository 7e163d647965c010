"""Round-10 ADVICE regressions (all five items from the r9 advisor):

1. medium -- matview refresh's read-fold-commit span is now
   conflict-guarded end to end: merge_version accepts the caller's
   pinned base, so a commit landing on the MV between refresh's
   accumulator read and its merge raises VersionConflictError
   instead of silently folding over stale rows (lost update).
2. low -- adopt_legacy_history keeps the current pointer-log line
   VERBATIM, preserving its commit timestamp (read_as_of /
   history committed_at survive adoption).
3. low -- consume_changes only falls back to the full-table resend
   on a missing/corrupt cursor FILE; a cursor naming a version
   absent from the commit log surfaces read_changes' ValueError.
4. low -- _psi_score's observed-bucket domain (docstring-only fix;
   behavior pinned by the existing drift oracle tests).
5. low -- directory names are matched with the strict v_N regex:
   a stray dir named like a timestamped pointer line ("v_00000001
   5") never parses as a committed version.
"""

from __future__ import annotations

import os

import pytest

from esg_decarbonization_data_integration_and_data_pipline_spark.io.matview import (
    create_aggregate_view,
    read_aggregate_view,
    refresh_aggregate_view,
)
from esg_decarbonization_data_integration_and_data_pipline_spark.io import versioned as V
from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
    VersionConflictError,
    _versions,
    adopt_legacy_history,
    append_version,
    consume_changes,
    current_version,
    history,
    merge_version,
    read_current,
    version_as_of,
)

MEASURES = [{"name": "n", "agg": "count"},
            {"name": "total", "agg": "sum", "col": "x"}]


def _src(spark, rows):
    return spark.createDataFrame(rows, "k bigint, g string, x double")


def _kv(spark, pairs):
    return spark.createDataFrame(pairs, "k bigint, a string")


def test_merge_version_stale_pinned_base_raises(spark, tmp_path):
    t = str(tmp_path / "t")
    append_version(_kv(spark, [(1, "a")]), t, stats_columns=["k"])
    stale = current_version(t)
    append_version(_kv(spark, [(2, "b")]), t)
    with pytest.raises(VersionConflictError):
        merge_version(spark, t, _kv(spark, [(1, "NEW")]), "k",
                      pinned_base=stale)
    # without the pin the same merge lands fine
    n = merge_version(spark, t, _kv(spark, [(1, "NEW")]), "k")
    assert n == current_version(t)
    got = {(r.k, r.a) for r in read_current(spark, t).collect()}
    assert got == {(1, "NEW"), (2, "b")}


def test_refresh_raises_on_interleaved_mv_commit(spark, tmp_path,
                                                 monkeypatch):
    """The advisor's exact race: a commit lands on the MV between
    refresh's accumulator read (pinned to mv_base) and its merge.
    Before the fix, merge re-resolved its own base and silently
    folded the delta over stale accumulator rows; now the whole
    span is pinned and the refresh raises."""
    src, mv = str(tmp_path / "s"), str(tmp_path / "m")
    append_version(_src(spark, [(1, "a", 1.0), (2, "b", 4.0)]), src,
                   stats_columns=["k"])
    create_aggregate_view(spark, src, mv, ["g"], MEASURES)
    append_version(_src(spark, [(3, "a", 5.0)]), src)

    real = V._touched_files
    fired = {"done": False}

    def interleave(sparkx, table_dir, base, keys, key):
        # first _touched_files call inside refresh (on the MV, at
        # mv_base): land a concurrent MV commit inside the window
        if not fired["done"] and os.path.abspath(table_dir) == \
                os.path.abspath(mv):
            fired["done"] = True
            append_version(read_current(sparkx, mv), mv)
        return real(sparkx, table_dir, base, keys, key)

    monkeypatch.setattr(V, "_touched_files", interleave)
    with pytest.raises(VersionConflictError):
        refresh_aggregate_view(spark, mv)
    # the failed refresh committed NOTHING past the interloper's
    # commit (v2); full_refresh is the documented recovery and
    # restores exact GROUP BY parity over the source
    monkeypatch.setattr(V, "_touched_files", real)
    assert current_version(mv) == 2
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.matview import full_refresh_aggregate_view
    full_refresh_aggregate_view(spark, mv)
    rows = sorted((r.g, r.n, r.total) for r in
                  read_aggregate_view(spark, mv).collect())
    assert rows == [("a", 2, 6.0), ("b", 1, 4.0)]


def test_adopt_legacy_history_preserves_current_timestamp(
        spark, tmp_path):
    t = str(tmp_path / "t")
    df = spark.createDataFrame([(1,)], "x bigint")
    append_version(df, t)
    append_version(df, t)
    append_version(df, t)
    raw = V._DEFAULT_BACKEND.read_pointer(t)
    last_line = raw.decode().splitlines()[-1]
    assert " " in last_line  # current line carries its commit ts
    ts = float(last_line.split()[1])
    # simulate the legacy single-line pointer, ts intact
    with open(os.path.join(t, "_CURRENT"), "wb") as fh:
        fh.write((last_line + "\n").encode())
    assert adopt_legacy_history(t) == [1, 2]
    h = {e["version"]: e["committed_at"] for e in history(t)}
    assert h[3] == ts          # verbatim line kept, not re-bared
    assert h[1] is None and h[2] is None
    assert version_as_of(t, ts + 1.0) == 3


def test_consume_changes_invalid_cursor_version_raises(
        spark, tmp_path):
    t = str(tmp_path / "t")
    df = spark.createDataFrame([(1,)], "x bigint")
    append_version(df, t)
    append_version(df, t)
    cursor = str(tmp_path / "cursor")
    with open(cursor, "w", encoding="ascii") as fh:
        fh.write("99\n")       # parses fine, was never committed
    with pytest.raises(ValueError, match="never committed"):
        consume_changes(spark, t, cursor)
    # corrupt cursor FILE still takes the documented full-resend path
    with open(cursor, "w", encoding="ascii") as fh:
        fh.write("not-a-number\n")
    changes, ack = consume_changes(spark, t, cursor)
    assert changes.count() == 2
    ack()
    changes2, _ = consume_changes(spark, t, cursor)
    assert changes2.count() == 0


def test_stray_timestamped_dir_is_not_a_version(spark, tmp_path):
    t = str(tmp_path / "t")
    append_version(spark.createDataFrame([(1,)], "x bigint"), t)
    os.makedirs(os.path.join(t, "v_00000099 5"))
    assert _versions(t) == [1]
    assert current_version(t) == 1
    assert read_current(spark, t).count() == 1
