"""Zero-data-I/O pin for the metadata-answered aggregates (r12
verdict task #5): table_rowcount / column_range / count_nulls /
count_where must answer from manifests + parquet footers alone on a
stats-bearing table -- proven by passing spark=None, which would
AttributeError on any scan. Also documents-by-test the Python
DataSource API limitation: no aggregate-pushdown hook exists on
pyspark 4.1, so the format() face cannot intercept count/min/max."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
    append_version, column_range, count_nulls, count_where,
    delete_keys_version, table_rowcount,
)


@pytest.fixture()
def vtable(spark, tmp_path):
    td = str(tmp_path / "t")
    df = spark.range(200).select(
        F.col("id"), (F.col("id") * 2.5).alias("x"),
        F.when(F.col("id") % 7 == 0, F.lit(None))
         .otherwise(F.col("id") % 10).cast("long").alias("g"))
    append_version(df.filter("id < 120"), td,
                   stats_columns=["id", "x"])
    append_version(df.filter("id >= 120"), td)
    delete_keys_version(
        spark, td, df.filter("id % 11 = 0").select("id"), "id")
    return td


def test_rowcount_is_sparkless(vtable):
    # table_rowcount takes no SparkSession at all -- structurally
    # zero Spark jobs
    assert table_rowcount(vtable, 1) == 120
    assert table_rowcount(vtable, 2) == 200
    assert table_rowcount(vtable, 3) == 200 - len(
        [i for i in range(200) if i % 11 == 0])


def test_column_range_zero_scan_with_stats(vtable):
    # spark=None: any data scan would blow up on the None session
    lo, hi = column_range(None, vtable, "x", n=2)
    assert (lo, hi) == (0.0, 199 * 2.5)
    lo1, hi1 = column_range(None, vtable, "id", n=1)
    assert (lo1, hi1) == (0, 119)


def test_count_nulls_zero_scan_with_rowmeta(vtable):
    n = count_nulls(None, vtable, "g", n=2)
    assert n == len([i for i in range(200) if i % 7 == 0])
    assert count_nulls(None, vtable, "x", n=2) == 0


def test_count_where_interior_files_need_no_scan(vtable):
    # unbounded: every file is provably interior without stats (all
    # non-null rows are in range; null counts come from metadata)
    assert count_where(None, vtable, "x", n=2) == 200
    # a bounded range needs recorded stats to prove containment --
    # v1 carries them, so a covering range is still zero-scan there
    assert count_where(None, vtable, "x", lo=-1.0, hi=1e9, n=1) == 120


def test_count_where_boundary_scan_is_exact(spark, vtable):
    got = count_where(spark, vtable, "id", hi=57, n=2)
    assert got == 58


@pytest.fixture()
def snaptable(spark, tmp_path):
    """A PARTITIONED SNAPSHOT (write_version partition_by +
    stats_columns -- r13 verdict task 3: snapshots previously
    recorded no manifest, answering metadata-flat only for the
    partition column)."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import write_version

    td = str(tmp_path / "s")
    df = spark.range(200).select(
        F.col("id"), (F.col("id") * 2.5).alias("x"),
        F.when(F.col("id") % 7 == 0, F.lit(None))
         .otherwise(F.col("id") % 4).cast("int").alias("p"))
    write_version(df, td, partition_by=("p",),
                  stats_columns=["id", "x"])
    return td


def test_partitioned_snapshot_rowcount_sparkless(snaptable):
    assert table_rowcount(snaptable, 1) == 200


def test_partitioned_snapshot_nonpartition_columns_zero_scan(snaptable):
    # the r13 watch item: min/max, null counts and bounded counts on
    # NON-partition columns of a partitioned snapshot must answer
    # from the manifest alone (spark=None blows up on any scan)
    assert column_range(None, snaptable, "x", n=1) == (0.0, 199 * 2.5)
    assert count_nulls(None, snaptable, "x", n=1) == 0
    assert count_where(None, snaptable, "x",
                       lo=-1.0, hi=1e9, n=1) == 200
    assert count_where(None, snaptable, "id", n=1) == 200


def test_partitioned_snapshot_partition_column_zero_scan(snaptable):
    # the path tier still answers for the partition column itself,
    # incl. the null-marker directory's all-null proof
    assert count_nulls(None, snaptable, "p", n=1) == len(
        [i for i in range(200) if i % 7 == 0])
    assert count_where(None, snaptable, "p", lo=2, hi=2, n=1) == len(
        [i for i in range(200) if i % 7 != 0 and i % 4 == 2])


def test_unpartitioned_snapshot_zero_scan(spark, tmp_path):
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import write_version

    td = str(tmp_path / "u")
    write_version(spark.range(50).select(
        F.col("id"), (F.col("id") % 5).alias("m")), td,
        stats_columns=["id"])
    assert table_rowcount(td, 1) == 50
    assert column_range(None, td, "id", n=1) == (0, 49)
    assert count_where(None, td, "id", lo=0, hi=100, n=1) == 50


def test_python_ds_api_has_no_aggregate_hook():
    """The documented refusal: Spark 4.1's Python DataSource reader
    surface is partitions/pushFilters/read -- if an aggregate-
    pushdown hook ever appears here, this test fails as a reminder
    to wire the manifest answers into the format() face."""
    from pyspark.sql.datasource import DataSourceReader

    hooks = {m for m in dir(DataSourceReader)
             if not m.startswith("_")}
    assert hooks == {"partitions", "pushFilters", "read"}
