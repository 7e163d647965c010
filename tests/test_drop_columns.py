"""Zero-copy column drop (io/versioned.drop_columns): a metadata-only
commit narrows the pinned schema, inherits every file by reference,
and earlier versions keep showing the column under their own
schemas."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
    VersionConflictError,
    _data_files,
    _read_stats,
    append_version,
    compact_table,
    count_nulls,
    current_version,
    drop_columns,
    merge_version,
    read_current,
    read_version,
    table_rowcount,
    table_schema,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k bigint, a string, x double")


def test_drop_is_metadata_only_and_time_travel_keeps_schema(
        spark, tmp_path):
    t = str(tmp_path / "t")
    append_version(_df(spark, [(1, "a1", 1.5), (2, "a2", 2.5)])
                   .coalesce(1), t, txn="b1",
                   stats_columns=["k", "x"])
    files_before = _data_files(t, 1)
    mtimes = {f: os.path.getmtime(os.path.join(t, f))
              for f in files_before}
    n = drop_columns(spark, t, "x")
    assert n == 2
    # zero copy: same physical files, untouched bytes
    assert _data_files(t, 2) == files_before
    assert all(os.path.getmtime(os.path.join(t, f)) == mtimes[f]
               for f in files_before)
    # new schema lacks x; reads project it away
    assert table_schema(t, 2).fieldNames() == ["k", "a"]
    got = sorted((r.k, r.a) for r in read_current(spark, t).collect())
    assert got == [(1, "a1"), (2, "a2")]
    assert "x" not in read_current(spark, t).columns
    # time travel BEFORE the drop still shows the column
    v1 = read_version(spark, t, 1)
    assert v1.columns == ["k", "a", "x"]
    assert sorted(r.x for r in v1.collect()) == [1.5, 2.5]
    # txn markers and metadata counts carry forward; x's stats leave
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import _txns

    assert "b1" in _txns(t, 2)
    assert table_rowcount(t, 2) == 2
    assert all("x" not in cols for cols in _read_stats(t, 2).values())
    assert all("k" in cols for cols in _read_stats(t, 2).values())
    assert count_nulls(spark, t, "k", 2) == 0


def test_table_evolves_normally_after_drop(spark, tmp_path):
    t = str(tmp_path / "t")
    append_version(_df(spark, [(1, "a1", 1.0)]).coalesce(1), t,
                   stats_columns=["k"])
    drop_columns(spark, t, ["x"])
    # appends now enforce the NARROW schema
    narrow = spark.createDataFrame([(2, "a2")], "k bigint, a string")
    append_version(narrow.coalesce(1), t)
    got = sorted((r.k, r.a) for r in read_current(spark, t).collect())
    assert got == [(1, "a1"), (2, "a2")]
    # merges and compaction work over the mixed physical layouts
    merge_version(spark, t, spark.createDataFrame(
        [(1, "A1")], "k bigint, a string"), "k")
    compact_table(spark, t)
    got = sorted((r.k, r.a) for r in read_current(spark, t).collect())
    assert got == [(1, "A1"), (2, "a2")]
    # the compaction rewrote under the narrow schema: physically gone
    import pyarrow.parquet as pq

    cur = current_version(t)
    for f in _data_files(t, cur):
        assert "x" not in pq.ParquetFile(
            os.path.join(t, f)).schema_arrow.names


def test_readding_a_dropped_name_resurrects_old_values(
        spark, tmp_path):
    """Documented name-based semantics (the Delta legacy
    column-mapping mode): parquet columns resolve BY NAME, so
    re-adding a dropped column's name makes pre-drop files surface
    their old physical values again -- NOT NULLs.  The drop_columns
    docstring tells users to compact after the drop if the name may
    return; this test pins the wart so a future field-id remapping
    shows up as an intentional behavior change."""
    t = str(tmp_path / "t")
    append_version(_df(spark, [(1, "a1", 9.9)]).coalesce(1), t)
    drop_columns(spark, t, "x")
    evolved = spark.createDataFrame([(2, "a2", 7.7)],
                                    "k bigint, a string, x double")
    append_version(evolved.coalesce(1), t, merge_schema=True)
    rows = {r.k: r.x for r in read_current(spark, t).collect()}
    assert rows == {1: 9.9, 2: 7.7}
    # compacting right after the drop physically removes the column,
    # so the same re-add then reads NULL for the old rows
    t2 = str(tmp_path / "t2")
    append_version(_df(spark, [(1, "a1", 9.9)]).coalesce(1), t2)
    drop_columns(spark, t2, "x")
    compact_table(spark, t2)
    append_version(evolved.coalesce(1), t2, merge_schema=True)
    rows2 = {r.k: r.x for r in read_current(spark, t2).collect()}
    assert rows2 == {1: None, 2: 7.7}


def test_drop_validations(spark, tmp_path):
    t = str(tmp_path / "t")
    append_version(_df(spark, [(1, "a1", 1.0)]), t)
    with pytest.raises(ValueError, match="not in the current schema"):
        drop_columns(spark, t, ["nope"])
    with pytest.raises(ValueError, match="no columns"):
        drop_columns(spark, t, ["k", "a", "x"])
    with pytest.raises(ValueError, match="at least one"):
        drop_columns(spark, t, [])
    with pytest.raises(FileNotFoundError):
        drop_columns(spark, str(tmp_path / "missing"), ["x"])


def test_concurrent_commit_mid_drop_raises(spark, tmp_path,
                                           monkeypatch):
    from esg_decarbonization_data_integration_and_data_pipline_spark.io import versioned as V

    t = str(tmp_path / "t")
    append_version(_df(spark, [(1, "a1", 1.0)]), t)
    real = V._write_schema_file
    fired = {"done": False}

    def interleave(dir_path, schema):
        if not fired["done"] and "v_0000" in dir_path:
            fired["done"] = True
            append_version(_df(spark, [(2, "a2", 2.0)]), t)
        return real(dir_path, schema)

    monkeypatch.setattr(V, "_write_schema_file", interleave)
    with pytest.raises(VersionConflictError):
        drop_columns(spark, t, "x")
    monkeypatch.setattr(V, "_write_schema_file", real)
    # the failed claim was reaped; a re-run lands cleanly
    n = drop_columns(spark, t, "x")
    assert n == current_version(t)
    assert table_schema(t, n).fieldNames() == ["k", "a"]
    assert read_current(spark, t).count() == 2


def test_cdf_across_a_drop_is_empty(spark, tmp_path):
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import read_changes

    t = str(tmp_path / "t")
    append_version(_df(spark, [(1, "a1", 1.0)]).coalesce(1), t)
    drop_columns(spark, t, "x")
    # no file changed hands: the delta across the DDL commit is empty
    assert read_changes(spark, t, 1, 2).count() == 0