"""Zero-copy type widening (Delta ALTER COLUMN TYPE, restricted to
parquet-upcast-safe pairs): a metadata-only commit widens the pinned
schema; readers upcast narrow physical columns in the scan; appends
after the widening carry the wide type natively."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
    SchemaMismatchError,
    _data_files,
    append_version,
    count_where,
    current_version,
    delete_keys_dv,
    read_changes,
    read_current,
    read_version,
    rename_column,
    table_schema,
    widen_column_type,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _mk(spark, td):
    df = spark.createDataFrame([(1, 10, 1.5), (2, 20, 2.5)],
                               "k int, v int, x float")
    return append_version(df.coalesce(1), td, stats_columns=["v"])


def test_widen_then_read_both_eras(spark, tmp_path):
    td = str(tmp_path / "t")
    base = _mk(spark, td)
    n = widen_column_type(spark, td, "v", "long")
    widen_column_type(spark, td, "x", "double")
    cur = read_current(spark, td)
    assert dict(cur.dtypes) == {"k": "int", "v": "bigint",
                                "x": "double"}
    assert _rows(cur.select("k", "v")) == [(1, 10), (2, 20)]
    # metadata-only: no new data files, originals untouched
    assert [f for f in _data_files(td, n)
            if f.startswith(f"v_{n:08d}")] == []
    old = read_version(spark, td, base)
    assert dict(old.dtypes)["v"] == "int"


def test_append_after_widen_carries_wide_type(spark, tmp_path):
    td = str(tmp_path / "t")
    _mk(spark, td)
    widen_column_type(spark, td, "v", "long")
    # the narrow type is now a schema mismatch (type conflict)
    with pytest.raises(SchemaMismatchError):
        append_version(
            spark.createDataFrame([(3, 30, 3.5)],
                                  "k int, v int, x float"), td)
    n = append_version(
        spark.createDataFrame([(3, 30, 3.5)],
                              "k int, v long, x float"), td)
    own = [f for f in _data_files(td, n) if f.startswith(f"v_{n:08d}")]
    sch = pq.ParquetFile(os.path.join(td, own[0])).schema_arrow
    assert str(sch.field("v").type) == "int64"
    assert _rows(read_current(spark, td).select("v")) == [
        (10,), (20,), (30,)]


def test_widen_refusals_and_noop(spark, tmp_path):
    td = str(tmp_path / "t")
    base = _mk(spark, td)
    with pytest.raises(ValueError, match="not a parquet-upcast-safe"):
        widen_column_type(spark, td, "v", "short")  # narrowing
    with pytest.raises(ValueError, match="not a parquet-upcast-safe"):
        widen_column_type(spark, td, "x", "long")  # float -> int
    with pytest.raises(ValueError, match="unknown target type"):
        widen_column_type(spark, td, "v", "string")
    with pytest.raises(ValueError, match="not in the current schema"):
        widen_column_type(spark, td, "nope", "long")
    assert widen_column_type(spark, td, "v", "int") == base  # no-op


def test_widen_keeps_stats_and_metadata_counts(spark, tmp_path):
    td = str(tmp_path / "t")
    _mk(spark, td)
    n = widen_column_type(spark, td, "v", "long")
    # file-skipping stats carried verbatim answer under the wide type
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import _count_where_plan

    meta_rows, boundary = _count_where_plan(td, n, "v", 10, 20)
    assert meta_rows == 2 and boundary == []
    assert count_where(spark, td, "v", lo=10, hi=20) == 2


def test_widen_is_row_identical_for_the_change_feed(spark, tmp_path):
    td = str(tmp_path / "t")
    base = _mk(spark, td)
    n = widen_column_type(spark, td, "v", "long")
    assert read_changes(spark, td, base, n).count() == 0


def test_widen_composes_with_rename_and_dv(spark, tmp_path):
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.fsck import verify_table

    td = str(tmp_path / "t")
    _mk(spark, td)
    rename_column(spark, td, "v", "value")
    widen_column_type(spark, td, "value", "long")
    st = table_schema(td, current_version(td))
    assert st["value"].metadata["physical"] == "v"  # pin preserved
    delete_keys_dv(spark, td,
                   spark.createDataFrame([(1,)], "k int"), "k")
    assert _rows(read_current(spark, td).select("k", "value")) == [
        (2, 20)]
    assert verify_table(spark, td, deep=True)["ok"]


def test_widen_through_datasource_face(spark, tmp_path):
    from esg_decarbonization_data_integration_and_data_pipline_spark.sources.versioned_source import (
        register,
    )

    register(spark)
    td = str(tmp_path / "t")
    _mk(spark, td)
    widen_column_type(spark, td, "v", "long")
    df = (spark.read.format("versioned_table")
          .option("path", td).load())
    assert dict(df.dtypes)["v"] == "bigint"
    assert _rows(df.select("k", "v")) == [(1, 10), (2, 20)]
