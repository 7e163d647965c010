"""SQL integration of the versioned_table format: the format() read
lands in a (global) temp view and composes with plain SQL.  Catalog
``CREATE TABLE ... USING versioned_table`` is NOT supported by this
Spark build's Python DataSource table path -- the SELECT-time
provider instantiates the source with EMPTY options (verified by
instrumentation: the read-planning DataSource received {}), so the
stored path never reaches reader(); the module docstring documents
the temp-view route instead."""

from __future__ import annotations

import pytest

from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
    append_version,
)
from esg_decarbonization_data_integration_and_data_pipline_spark.sources.versioned_source import (
    register,
)


@pytest.fixture()
def registered(spark):
    register(spark)
    return spark


def test_sql_over_format_read_via_temp_view(registered, tmp_path):
    spark = registered
    td = str(tmp_path / "t")
    append_version(
        spark.createDataFrame([(1, "a"), (2, "b")],
                              "k bigint, v string").coalesce(1), td)
    append_version(
        spark.createDataFrame([(3, "c")], "k bigint, v string"), td)
    (spark.read.format("versioned_table").option("path", td).load()
     .createOrReplaceTempView("vt_cur"))
    (spark.read.format("versioned_table").option("path", td)
     .option("version", "1").load()
     .createOrReplaceTempView("vt_v1"))
    got = sorted((r.k, r.v) for r in
                 spark.sql("SELECT * FROM vt_cur").collect())
    assert got == [(1, "a"), (2, "b"), (3, "c")]
    # predicates/aggregates/joins compose through plain SQL,
    # including a time-travel self-join across versions
    assert spark.sql(
        "SELECT count(*) AS n FROM vt_cur WHERE k > 1"
    ).collect()[0]["n"] == 2
    new_keys = spark.sql("""
        SELECT c.k FROM vt_cur c LEFT ANTI JOIN vt_v1 o ON c.k = o.k
    """).collect()
    assert [r.k for r in new_keys] == [3]


def test_file_uri_path_option_accepted(registered, tmp_path):
    """A file: URI in the path option (how qualified paths arrive
    from SQL-ish tooling) resolves to the same table -- scheme
    case-insensitively; a non-local authority is refused rather than
    silently resolved against the local filesystem."""
    spark = registered
    td = str(tmp_path / "t")
    append_version(
        spark.createDataFrame([(1, "a")], "k bigint, v string"), td)
    for uri in (f"file://{td}", f"file:{td}", f"FILE://{td}"):
        got = (spark.read.format("versioned_table")
               .option("path", uri).load().collect())
        assert [(r.k, r.v) for r in got] == [(1, "a")], uri
    with pytest.raises(Exception, match="non-local authority"):
        (spark.read.format("versioned_table")
         .option("path", f"file://otherhost{td}").load().collect())
