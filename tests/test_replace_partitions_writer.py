"""Dynamic partition overwrite through the format() WRITE face
(``df.write.format("versioned_table").mode("overwrite")
.option("partitionOverwriteMode", "dynamic")`` -- r13 verdict task 1:
the reference's idempotent month reload, jobs/csr_etl.py:157 /
jobs/raw_to_staging.py:203, on the API a Spark user actually writes)
plus the r13 ADVICE typed partition-key comparison
(io/versioned._replace_partition_key: timestamp/decimal supported,
unparseable values RAISE instead of silently degrading the replace
to an append or dropping null-keyed files)."""

from __future__ import annotations

import decimal

import pytest
from pyspark.sql import functions as F

from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
    VersionConflictError,
    _data_files,
    _replace_partition_key,
    append_version,
    current_version,
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
    data = [(i, m, a) for m, rows in month_rows.items()
            for i, a in rows]
    return spark.createDataFrame(
        data, "id bigint, month string, amt double")


@pytest.fixture()
def mtable(spark, tmp_path):
    td = str(tmp_path / "m")
    write_version(
        _months(spark, {"2024-01": [(1, 10.0), (2, 20.0)],
                        "2024-02": [(3, 30.0)],
                        "2024-03": [(4, 40.0)]}),
        td, partition_by=("month",))
    register_ds(spark)
    return td


def _dyn_writer(df, td):
    return (df.write.format("versioned_table")
            .mode("overwrite")
            .option("path", td)
            .option("partitionBy", "month")
            .option("partitionOverwriteMode", "dynamic"))


def test_writer_dynamic_replaces_touched_partitions_only(
        spark, mtable):
    batch = _months(spark, {"2024-02": [(30, 300.0), (31, 310.0)],
                            "2024-04": [(5, 50.0)]})
    _dyn_writer(batch, mtable).save()
    v = current_version(mtable)
    cur = read_current(spark, mtable)
    assert sorted(r.id for r in cur.collect()) == [1, 2, 4, 5, 30, 31]
    assert cur.filter("month = '2024-02'").count() == 2
    # untouched partitions inherit BY REFERENCE
    inherited = set(_data_files(mtable, 1)) & set(_data_files(mtable, v))
    assert inherited and all("month=2024-02" not in f
                             for f in inherited)
    # time travel keeps the superseded slice
    assert read_version(spark, mtable, 1) \
        .filter("month = '2024-02'").count() == 1
    op = [h for h in history(mtable) if h["version"] == v][0]
    assert op["operation"] == "REPLACE_PARTITIONS"
    assert op["operation_params"]["n_partitions"] == 2
    assert op["operation_params"]["face"] == "format(versioned_table)"


def test_writer_dynamic_txn_replay_noops(spark, mtable):
    batch = _months(spark, {"2024-01": [(9, 90.0)]})
    _dyn_writer(batch, mtable).option("txn", "load:2024-01").save()
    v = current_version(mtable)
    _dyn_writer(batch, mtable).option("txn", "load:2024-01").save()
    assert current_version(mtable) == v
    assert read_current(spark, mtable) \
        .filter("month = '2024-01'").count() == 1


def test_writer_dynamic_null_partition(spark, mtable):
    base = spark.createDataFrame(
        [(90, None, 9.0)], "id bigint, month string, amt double")
    _dyn_writer(base, mtable).save()
    assert read_current(spark, mtable) \
        .filter("month IS NULL").count() == 1
    # reload of the null partition replaces ONLY it
    _dyn_writer(spark.createDataFrame(
        [(91, None, 9.1)], "id bigint, month string, amt double"),
        mtable).save()
    cur = read_current(spark, mtable)
    assert [r.id for r in cur.filter("month IS NULL").collect()] \
        == [91]
    assert cur.count() == 5  # 4 original rows + the null reload


def test_writer_dynamic_on_renamed_partition_column(spark, mtable):
    """Column mapping composes with the writer-face replace: after
    rename_column the DIRECTORIES still carry the original physical
    name, the batch speaks the NEW logical name, and the drop set
    must key both sides through the mapping."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import rename_column

    rename_column(spark, mtable, "month", "period")
    batch = spark.createDataFrame(
        [(40, "2024-02", 400.0)], "id bigint, period string, amt double")
    (batch.write.format("versioned_table").mode("overwrite")
     .option("path", mtable).option("partitionBy", "period")
     .option("partitionOverwriteMode", "dynamic").save())
    cur = read_current(spark, mtable)
    assert [r.id for r in cur.filter("period = '2024-02'")
            .collect()] == [40]
    assert cur.count() == 4  # months 01 (2 rows) + 03 + the reload


def test_function_replace_on_renamed_partition_column(spark, mtable):
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import rename_column

    rename_column(spark, mtable, "month", "period")
    batch = spark.createDataFrame(
        [(41, "2024-03", 410.0)], "id bigint, period string, amt double")
    replace_partitions(spark, mtable, batch, ("period",))
    cur = read_current(spark, mtable)
    assert [r.id for r in cur.filter("period = '2024-03'")
            .collect()] == [41]
    assert cur.count() == 4


def test_writer_dynamic_requires_overwrite_mode(spark, mtable):
    batch = _months(spark, {"2024-01": [(9, 90.0)]})
    with pytest.raises(Exception, match="mode..overwrite.."):
        (batch.write.format("versioned_table").mode("append")
         .option("path", mtable).option("partitionBy", "month")
         .option("partitionOverwriteMode", "dynamic").save())


def test_writer_dynamic_requires_partition_by(spark, mtable):
    batch = _months(spark, {"2024-01": [(9, 90.0)]})
    with pytest.raises(Exception, match="partitionBy"):
        (batch.write.format("versioned_table").mode("overwrite")
         .option("path", mtable)
         .option("partitionOverwriteMode", "dynamic").save())


def test_writer_dynamic_refuses_flat_layout(spark, tmp_path):
    td = str(tmp_path / "flat")
    append_version(_months(spark, {"2024-01": [(1, 1.0)]}), td)
    register_ds(spark)
    with pytest.raises(Exception, match="compact_table"):
        _dyn_writer(
            _months(spark, {"2024-01": [(2, 2.0)]}), td).save()


def test_writer_dynamic_refuses_empty_table(spark, tmp_path):
    td = str(tmp_path / "none")
    register_ds(spark)
    with pytest.raises(Exception, match="no committed version"):
        _dyn_writer(
            _months(spark, {"2024-01": [(2, 2.0)]}), td).save()


def test_writer_replacewhere_refused(spark, mtable):
    batch = _months(spark, {"2024-01": [(9, 90.0)]})
    with pytest.raises(Exception, match="replaceWhere"):
        (batch.write.format("versioned_table").mode("overwrite")
         .option("path", mtable).option("partitionBy", "month")
         .option("replaceWhere", "month = '2024-01'").save())


def test_stream_writer_refuses_dynamic(spark, mtable, tmp_path):
    # the refusal fires on the stream-execution thread (the Python
    # DataSource stream writer is constructed there), so it surfaces
    # through query termination, not from .start()
    sdf = (spark.readStream.format("rate")
           .option("rowsPerSecond", 1).load()
           .selectExpr("value AS id", "'2024-01' AS month",
                       "1.0 AS amt"))
    before = current_version(mtable)
    q = (sdf.writeStream.format("versioned_table")
         .option("path", mtable)
         .option("txnAppId", "x")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .option("partitionOverwriteMode", "dynamic")
         .trigger(availableNow=True).start())
    with pytest.raises(Exception, match="batch-write shape"):
        q.awaitTermination()
    # nothing committed through the refused sink
    assert current_version(mtable) == before
    assert read_current(spark, mtable).count() == 4


def test_writer_dynamic_conflict_pins_base(spark, mtable):
    """A commit landing between the writer's plan and its commit()
    raises VersionConflictError -- the drop set was computed against
    the pinned base, and rebasing would silently resurrect rows the
    competitor replaced.  Driven through the writer object directly
    (the one-call public API leaves no window to interleave in)."""
    import pyarrow as pa

    from esg_decarbonization_data_integration_and_data_pipline_spark.sources.versioned_source import (
        _VersionedBatchWriter,
    )

    batch = _months(spark, {"2024-02": [(30, 300.0)]})
    w = _VersionedBatchWriter(
        {"path": mtable, "partitionBy": "month",
         "partitionOverwriteMode": "dynamic"},
        batch.schema, overwrite=True)
    msg = w.write(iter(pa.table(
        {"id": [30], "month": ["2024-02"], "amt": [300.0]}
    ).to_batches()))
    # competitor commits AFTER the plan pinned the base
    append_version(_months(spark, {"2024-05": [(8, 80.0)]}), mtable,
                   partition_by=("month",))
    with pytest.raises(VersionConflictError):
        w.commit([msg])
    # the one-call re-run converges
    _dyn_writer(batch, mtable).save()
    cur = read_current(spark, mtable)
    assert [r.id for r in cur.filter("month = '2024-02'").collect()] \
        == [30]
    assert cur.filter("month = '2024-05'").count() == 1


# --- r13 ADVICE: typed partition-key comparison -------------------


def test_replace_timestamp_partition_actually_replaces(
        spark, tmp_path):
    """Pre-fix, _typed_partition_value returned None for timestamps,
    so the replace silently degraded to an append (duplicates)."""
    td = str(tmp_path / "ts")
    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1.0),
         (2, "2024-02-01 06:30:00", 2.0)],
        "id bigint, ts string, amt double") \
        .withColumn("ts", F.to_timestamp("ts"))
    write_version(df, td, partition_by=("ts",))
    batch = spark.createDataFrame(
        [(20, "2024-02-01 06:30:00", 2.5)],
        "id bigint, ts string, amt double") \
        .withColumn("ts", F.to_timestamp("ts"))
    replace_partitions(spark, td, batch, ("ts",))
    got = sorted(r.id for r in read_current(spark, td).collect())
    assert got == [1, 20]  # 2 replaced, NOT appended alongside


def test_replace_decimal_partition_actually_replaces(
        spark, tmp_path):
    td = str(tmp_path / "dec")
    df = spark.createDataFrame(
        [(1, decimal.Decimal("1.50"), "a"),
         (2, decimal.Decimal("2.25"), "b")],
        "id bigint, rate decimal(10,2), tag string")
    write_version(df, td, partition_by=("rate",))
    batch = spark.createDataFrame(
        [(20, decimal.Decimal("1.50"), "a2")],
        "id bigint, rate decimal(10,2), tag string")
    replace_partitions(spark, td, batch, ("rate",))
    got = sorted(r.id for r in read_current(spark, td).collect())
    assert got == [2, 20]


def test_replace_unparseable_path_value_raises(spark, tmp_path,
                                               monkeypatch):
    """An int-typed partition dir whose value does not parse must
    RAISE -- pre-fix it keyed as None: the replace degraded to an
    append, and a null partition tuple in the batch would have
    matched the None key and DROPPED the unrelated file (data
    loss)."""
    import esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned as V

    td = str(tmp_path / "bad")
    df = spark.createDataFrame(
        [(1, 5, 1.0)], "id bigint, k int, amt double")
    write_version(df, td, partition_by=("k",))
    real = V._data_files

    def fake(table_dir, n, backend=None):
        return list(real(table_dir, n)) + \
            ["v_00000001/k=abc/part-bogus.parquet"]

    monkeypatch.setattr(V, "_data_files", fake)
    batch = spark.createDataFrame(
        [(2, None, 2.0)], "id bigint, k int, amt double")
    with pytest.raises(ValueError, match="cannot be interpreted"):
        replace_partitions(spark, td, batch, ("k",))


def test_replace_partition_key_units():
    from pyspark.sql.types import (
        BinaryType,
        DecimalType,
        IntegerType,
        TimestampType,
    )

    assert _replace_partition_key("7", IntegerType(), "k", "f") == 7
    assert _replace_partition_key(
        "2024-01-01 07:08:09.500000", TimestampType(), "ts", "f") \
        == "2024-01-01 07:08:09.5"
    assert _replace_partition_key(
        "1.50", DecimalType(10, 2), "d", "f") \
        == decimal.Decimal("1.5")
    with pytest.raises(ValueError, match="cannot be interpreted"):
        _replace_partition_key("x", IntegerType(), "k", "f")
    with pytest.raises(ValueError, match="cannot be interpreted"):
        # zoned dir value vs session-zone batch: refuse, don't guess
        _replace_partition_key(
            "2024-01-01 00:00:00+00:00", TimestampType(), "ts", "f")
    with pytest.raises(ValueError, match="does not support"):
        _replace_partition_key("x", BinaryType(), "b", "f")


def test_writer_dynamic_refuses_timestamp_partition(spark, tmp_path):
    """The Arrow write face renders zoned timestamps ambiguously in
    partition paths -- dynamic mode refuses them with guidance to
    the function face (which compares in session-zone canonical
    form)."""
    td = str(tmp_path / "tsw")
    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1.0)],
        "id bigint, ts string, amt double") \
        .withColumn("ts", F.to_timestamp("ts"))
    write_version(df, td, partition_by=("ts",))
    register_ds(spark)
    with pytest.raises(Exception, match="replace_partitions"):
        (df.write.format("versioned_table").mode("overwrite")
         .option("path", td).option("partitionBy", "ts")
         .option("partitionOverwriteMode", "dynamic").save())
