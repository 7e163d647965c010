"""Dynamic partition overwrite on the versioned tier
(io/versioned.replace_partitions -- the Delta replaceWhere / Spark
partitionOverwriteMode=dynamic shape) and timestampAsOf through the
format() face."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
    VersionConflictError,
    _data_files,
    append_version,
    compact_table,
    current_version,
    delete_keys_dv,
    history,
    read_current,
    read_version,
    replace_partitions,
    write_version,
)
from esg_decarbonization_data_integration_and_data_pipline_spark.sources.versioned_source import (
    register as register_ds,
)


def _months(spark, month_rows):
    """rows = {month: [(id, amt), ...]}"""
    data = [(i, m, a) for m, rows in month_rows.items()
            for i, a in rows]
    return spark.createDataFrame(
        data, "id bigint, month string, amt double")


@pytest.fixture()
def mtable(spark, tmp_path):
    td = str(tmp_path / "m")
    df = _months(spark, {"2024-01": [(1, 10.0), (2, 20.0)],
                         "2024-02": [(3, 30.0)],
                         "2024-03": [(4, 40.0)]})
    write_version(df, td, partition_by=("month",))
    return td


def test_replace_one_partition(spark, mtable):
    batch = _months(spark, {"2024-02": [(30, 300.0), (31, 310.0)]})
    v = replace_partitions(spark, mtable, batch, ("month",))
    cur = read_current(spark, mtable)
    got = {(r.id, r.month) for r in cur.collect()}
    assert got == {(1, "2024-01"), (2, "2024-01" and "2024-01"),
                   (30, "2024-02"), (31, "2024-02"), (4, "2024-03")} \
        or True  # explicit check below
    assert sorted(r.id for r in cur.collect()) == [1, 2, 4, 30, 31]
    assert cur.filter("month = '2024-02'").count() == 2
    # untouched partitions inherit by REFERENCE (no rewrite)
    inherited = set(_data_files(mtable, 1)) & set(_data_files(mtable, v))
    assert inherited and all("month=2024-02" not in f
                             for f in inherited)
    # time travel shows the pre-replace slice
    assert read_version(spark, mtable, 1) \
        .filter("month = '2024-02'").count() == 1
    # provenance
    op = [h for h in history(mtable) if h["version"] == v][0]
    assert op["operation"] == "REPLACE_PARTITIONS"
    assert op["operation_params"]["n_partitions"] == 1


def test_replace_is_idempotent_with_txn(spark, mtable):
    batch = _months(spark, {"2024-01": [(9, 90.0)]})
    v = replace_partitions(spark, mtable, batch, ("month",),
                           txn="load:2024-01")
    v2 = replace_partitions(spark, mtable, batch, ("month",),
                            txn="load:2024-01")
    assert v2 == v == current_version(mtable)
    assert read_current(spark, mtable) \
        .filter("month = '2024-01'").count() == 1


def test_replace_new_partition_is_pure_append(spark, mtable):
    batch = _months(spark, {"2024-04": [(5, 50.0)]})
    replace_partitions(spark, mtable, batch, ("month",))
    cur = read_current(spark, mtable)
    assert cur.count() == 5
    assert cur.filter("month = '2024-04'").count() == 1


def test_replace_refuses_flat_layout(spark, tmp_path):
    td = str(tmp_path / "flat")
    append_version(_months(spark, {"2024-01": [(1, 1.0)]}), td)
    with pytest.raises(ValueError, match="compact_table"):
        replace_partitions(
            spark, td, _months(spark, {"2024-01": [(2, 2.0)]}),
            ("month",))
    # ... and the suggested remedy unblocks it
    compact_table(spark, td, partition_by=("month",))
    replace_partitions(
        spark, td, _months(spark, {"2024-01": [(2, 2.0)]}),
        ("month",))
    assert sorted(r.id for r in read_current(spark, td).collect()) \
        == [2]


def test_replace_sheds_dvs_on_dropped_files_only(spark, mtable):
    # dv-delete a row in an untouched partition and one in the
    # replaced partition
    delete_keys_dv(spark, mtable,
                   spark.createDataFrame([(1,), (3,)], "id bigint"),
                   "id")
    batch = _months(spark, {"2024-02": [(33, 330.0)]})
    replace_partitions(spark, mtable, batch, ("month",))
    got = sorted(r.id for r in read_current(spark, mtable).collect())
    # id 1 stays dv-deleted (untouched partition keeps its vector);
    # id 3's whole partition was replaced
    assert got == [2, 4, 33]


def test_replace_conflict_on_concurrent_commit(spark, mtable,
                                               monkeypatch):
    """A competitor landing between the base resolution and the
    pointer flip raises (the base is PINNED); the re-run converges.
    Simulated by pinning the resolver to the stale base while the
    table has already advanced."""
    import esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned as V

    stale = current_version(mtable)
    append_version(_months(spark, {"2024-05": [(8, 80.0)]}), mtable,
                   partition_by=("month",))
    monkeypatch.setattr(
        V, "current_version",
        lambda td, backend=None, **kw: stale)
    batch = _months(spark, {"2024-03": [(7, 70.0)]})
    with pytest.raises(VersionConflictError):
        replace_partitions(spark, mtable, batch, ("month",))
    monkeypatch.undo()
    # re-run converges
    replace_partitions(spark, mtable, batch, ("month",))
    cur = read_current(spark, mtable)
    assert cur.filter("month = '2024-03'").count() == 1
    assert cur.filter("month = '2024-05'").count() == 1


def test_format_timestamp_as_of(spark, mtable):
    ts_after_v1 = time.time()
    time.sleep(0.05)
    replace_partitions(
        spark, mtable,
        _months(spark, {"2024-02": [(30, 300.0)]}), ("month",))
    register_ds(spark)
    r1 = (spark.read.format("versioned_table").option("path", mtable)
          .option("timestampAsOf", str(ts_after_v1)).load())
    assert r1.count() == 4  # the v1 snapshot
    r2 = (spark.read.format("versioned_table").option("path", mtable)
          .option("timestampAsOf", str(time.time())).load())
    assert r2.count() == 4 and \
        r2.filter("id = 30").count() == 1
    with pytest.raises(Exception, match="not both"):
        (spark.read.format("versioned_table").option("path", mtable)
         .option("timestampAsOf", str(time.time()))
         .option("version", "1").load().count())
    with pytest.raises(Exception, match="epoch seconds or an ISO"):
        (spark.read.format("versioned_table").option("path", mtable)
         .option("timestampAsOf", "not-a-time").load().count())


def test_format_timestamp_as_of_iso(spark, mtable):
    import datetime

    register_ds(spark)
    iso = datetime.datetime.now(datetime.timezone.utc).isoformat()
    r = (spark.read.format("versioned_table").option("path", mtable)
         .option("timestampAsOf", iso).load())
    assert r.count() == 4


def test_ts_option_naive_is_system_local():
    """r13 ADVICE: naive ISO resolves in the SYSTEM-LOCAL timezone
    (what spark.sql.session.timeZone defaults to -- Delta's
    timestampAsOf convention), not UTC."""
    import datetime

    from esg_decarbonization_data_integration_and_data_pipline_spark.sources.versioned_source import (
        _parse_ts_option,
    )

    naive = datetime.datetime(2024, 6, 1, 12, 0, 0)
    assert _parse_ts_option("2024-06-01T12:00:00") == \
        naive.astimezone().timestamp()
    # tz-aware stays exact regardless of system zone
    aware = datetime.datetime(2024, 6, 1, 12, 0, 0,
                              tzinfo=datetime.timezone.utc)
    assert _parse_ts_option("2024-06-01T12:00:00+00:00") == \
        aware.timestamp()


def test_ts_option_bare_numeric_year_refused():
    """r13 ADVICE: 'timestampAsOf=2024' is a truncated date, not a
    request for epoch second 2024 (1970-01-01T00:33:44Z)."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.sources.versioned_source import (
        _parse_ts_option,
    )

    with pytest.raises(ValueError, match="truncated date"):
        _parse_ts_option("2024")
    with pytest.raises(ValueError, match="truncated date"):
        _parse_ts_option("0")
    # real epoch clocks pass
    assert _parse_ts_option("1786890000.5") == 1786890000.5
