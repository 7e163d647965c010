"""Metadata-only row counts over versioned tables (io/versioned
table_rowcount / count_where): manifest-recorded per-file row and
null counts answer count(*) with no Spark job and range counts with
an O(endpoint-files) scan on a sorted table; correctness never
depends on the records existing (footer fallback / boundary scan).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
    _count_where_plan,
    append_version,
    compact_table,
    count_where,
    current_version,
    delete_keys_version,
    merge_version,
    read_current,
    table_rowcount,
    write_version,
)


def _df(spark, lo, n):
    return spark.range(lo, lo + n).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("x"))


def test_rowcount_matches_count_across_mutations(spark, tmp_path):
    t = str(tmp_path / "t")
    append_version(_df(spark, 0, 100).coalesce(2), t,
                   stats_columns=["k"])
    assert table_rowcount(t) == 100
    append_version(_df(spark, 100, 50), t)
    assert table_rowcount(t) == 150
    merge_version(spark, t, _df(spark, 140, 20), "k")  # 10 upd + 10 new
    assert table_rowcount(t) == read_current(spark, t).count() == 160
    delete_keys_version(
        spark, t, spark.range(0, 5).select(F.col("id").alias("k")), "k")
    assert table_rowcount(t) == 155
    compact_table(spark, t, sort_by=["k"])
    assert table_rowcount(t) == 155


def test_rowcount_time_travel_and_snapshot_fallback(spark, tmp_path):
    t = str(tmp_path / "t")
    append_version(_df(spark, 0, 10), t)
    append_version(_df(spark, 10, 5), t)
    assert table_rowcount(t, n=1) == 10
    assert table_rowcount(t, n=2) == 15
    # snapshot version (write_version: no manifest, no #rows lines)
    # falls back to the footer read and stays exact
    write_version(read_current(spark, t), t)
    assert table_rowcount(t) == 15


def test_rowcount_legacy_manifest_without_rows_lines(spark, tmp_path):
    """A manifest predating the #rows tier (simulated by stripping
    the lines) answers via per-file footer reads -- exact either
    way, the record just saves the round-trips."""
    t = str(tmp_path / "t")
    append_version(_df(spark, 0, 25).coalesce(1), t)
    mf = os.path.join(t, "v_00000001", "_MANIFEST")
    with open(mf, encoding="ascii") as fh:
        kept = [ln for ln in fh.read().splitlines()
                if not ln.startswith("#rows ")]
    with open(mf, "w", encoding="ascii") as fh:
        fh.write("\n".join(kept) + "\n")
    assert table_rowcount(t) == 25


def test_count_where_exact_and_boundary_bounded(spark, tmp_path):
    """On a key-sorted table the range count is metadata plus at most
    the two endpoint-straddling files; the result matches a full
    filter-count exactly."""
    t = str(tmp_path / "t")
    append_version(_df(spark, 0, 1000), t, stats_columns=["k"])
    compact_table(spark, t, sort_by=["k"], sort_partitions=8)
    n = current_version(t)
    expect = read_current(spark, t).filter(
        "k >= 200 and k <= 700").count()
    assert count_where(spark, t, "k", 200, 700) == expect == 501
    meta_rows, boundary = _count_where_plan(t, n, "k", 200, 700)
    assert len(boundary) <= 2  # only endpoint straddlers scan
    assert meta_rows + 0 < 501 or not boundary  # interior from metadata
    # fully-covering range: zero boundary files, zero Spark jobs
    meta_rows, boundary = _count_where_plan(t, n, "k", None, None)
    assert boundary == [] and meta_rows == 1000
    # provably-empty range: zero everything
    meta_rows, boundary = _count_where_plan(t, n, "k", 5000, 6000)
    assert boundary == [] and meta_rows == 0
    assert count_where(spark, t, "k", 5000, 6000) == 0
    # half-open ranges
    assert count_where(spark, t, "k", lo=990) == 10
    assert count_where(spark, t, "k", hi=9) == 10


def test_count_where_null_semantics(spark, tmp_path):
    """NULL keys never satisfy a range predicate (SQL comparison
    semantics); interior files subtract their recorded null counts,
    and the unbounded count equals count(col IS NOT NULL)."""
    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, 1.0), (2, None), (3, 3.0), (None, 4.0)],
        "k bigint, x double")
    append_version(df.coalesce(1), t, stats_columns=["k"])
    assert table_rowcount(t) == 4
    assert count_where(spark, t, "k", 1, 3) == 3
    assert count_where(spark, t, "k") == 3  # non-null k only
    assert count_where(spark, t, "x") == 3


def test_count_where_without_stats_scans_but_stays_exact(spark,
                                                         tmp_path):
    t = str(tmp_path / "t")
    append_version(_df(spark, 0, 50), t)  # no stats_columns
    # stats for k exist anyway (appends track the union of requested
    # and inherited columns; a fresh table tracks none) -- whether or
    # not files prune, the answer is exact
    assert count_where(spark, t, "k", 10, 19) == 10


def test_merge_and_append_inherit_rowmeta(spark, tmp_path):
    """Untouched inherited files keep their records: after an append
    and a merge, every data file still answers from metadata (no
    boundary scan for the full range)."""
    t = str(tmp_path / "t")
    append_version(_df(spark, 0, 100).coalesce(2), t,
                   stats_columns=["k"])
    append_version(_df(spark, 100, 100).coalesce(2), t)
    merge_version(spark, t, _df(spark, 50, 10), "k")
    n = current_version(t)
    meta_rows, boundary = _count_where_plan(t, n, "k", None, None)
    assert boundary == []
    assert meta_rows == 200 == table_rowcount(t)


def test_column_range_exact_across_mutations_and_types(spark,
                                                       tmp_path):
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
        _minmax_plan, column_range,
    )

    t = str(tmp_path / "t")
    append_version(_df(spark, 10, 50).coalesce(2), t,
                   stats_columns=["k"])
    assert column_range(spark, t, "k") == (10, 59)
    # x is untracked: footer stats answer it, still no scan
    assert column_range(spark, t, "x") == (20, 118)
    n = current_version(t)
    assert _minmax_plan(t, n, "x")[1] == []  # zero scan files
    append_version(_df(spark, 0, 5), t)
    delete_keys_version(
        spark, t, spark.range(0, 3).select(F.col("id").alias("k")),
        "k")
    # stats bound the SURVIVING files; min/max from stats can be
    # looser than the data after a delete? No: delete rewrites the
    # touched file with fresh stats, so the range stays exact
    got = column_range(spark, t, "k")
    want = read_current(spark, t).agg(F.min("k"), F.max("k")).first()
    assert got == (want[0], want[1])


def test_column_range_nulls_schema_and_string_guard(spark, tmp_path):
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import column_range

    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(None, "a"), (None, "b")], "k bigint, s string")
    append_version(df.coalesce(1), t)
    assert column_range(spark, t, "k") == (None, None)  # all-null
    with pytest.raises(ValueError, match="tpyo"):
        column_range(spark, t, "tpyo")
    with pytest.raises(ValueError, match="string"):
        column_range(spark, t, "s")  # parquet string stats truncate


def test_metadata_report_answers_minmax_count_bounds(spark,
                                                     tmp_path):
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators import expectations as E

    t = str(tmp_path / "t")
    df = spark.createDataFrame([(1, 5.0), (2, None), (3, 80.0)],
                               "k bigint, x double")
    append_version(df.coalesce(1), t, stats_columns=["k", "x"])
    got = {r["check_name"]: r for r in E.metadata_report(spark, t, [
        E.agg_between("x", "min", lo=0, name="min_ok"),
        E.agg_between("x", "max", hi=50, name="max_fails"),
        E.agg_between("x", "count", lo=2, name="vol_ok"),
        E.agg_between("k", "count", lo=5, name="vol_fails"),
    ])}
    assert got["min_ok"]["passed"]
    assert not got["max_fails"]["passed"]
    assert got["vol_ok"]["passed"]          # 2 non-null x
    assert not got["vol_fails"]["passed"]   # 3 non-null k < 5
    # equal to the scan-based report on the same version
    want = {r["check_name"]: r["passed"] for r in E.report(
        read_current(spark, t),
        [E.agg_between("x", "min", lo=0, name="min_ok"),
         E.agg_between("x", "max", hi=50, name="max_fails"),
         E.agg_between("x", "count", lo=2, name="vol_ok"),
         E.agg_between("k", "count", lo=5, name="vol_fails"),
         ]).collect()}
    assert {k: v["passed"] for k, v in got.items()} == want
    # sum/avg genuinely need the data
    with pytest.raises(ValueError, match="sum"):
        E.metadata_report(spark, t,
                          [E.agg_between("x", "sum", lo=0)])
    # ...but check_table routes them to the scan half
    rows = E.check_table(spark, t, [
        E.agg_between("x", "sum", lo=0, name="s"),
        E.agg_between("x", "max", hi=50, name="max_fails"),
    ])
    assert [r["check_name"] for r in rows] == ["s", "max_fails"]
    assert rows[0]["passed"] and not rows[1]["passed"]
