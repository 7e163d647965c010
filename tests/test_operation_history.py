"""Commit provenance (the Delta DESCRIBE HISTORY shape): every
manifest commit records WHICH operation produced it, its parameters
and cheap metrics; history() surfaces the record."""

from __future__ import annotations

from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
    append_version,
    compact_table,
    delete_keys_dv,
    history,
    merge_version,
    rename_column,
    restore_table,
    widen_column_type,
    write_version,
)


def _ops(td):
    return {h["version"]: h["operation"] for h in history(td)}


def test_history_records_operations(spark, tmp_path):
    td = str(tmp_path / "t")
    df = spark.createDataFrame([(1, 10), (2, 20)], "k int, v int")
    append_version(df.coalesce(1), td, stats_columns=["k"])
    merge_version(spark, td,
                  spark.createDataFrame([(1, 11)], "k int, v int"),
                  "k")
    rename_column(spark, td, "v", "value")
    widen_column_type(spark, td, "value", "long")
    delete_keys_dv(spark, td,
                   spark.createDataFrame([(2,)], "k int"), "k")
    compact_table(spark, td, sort_by=["k"])
    restore_table(spark, td, 5)
    ops = _ops(td)
    assert ops[1] == "APPEND"
    assert ops[2] == "MERGE"
    assert ops[3] == "RENAME_COLUMN"
    assert ops[4] == "WIDEN_COLUMN_TYPE"
    assert ops[5] == "DELETE_DV"
    assert ops[6] == "OPTIMIZE"
    assert ops[7] == "RESTORE"
    h = {x["version"]: x for x in history(td)}
    assert h[3]["operation_params"] == {"from": "v", "to": "value"}
    assert h[4]["operation_params"] == {
        "col": "value", "from": "integer", "to": "long"}
    assert h[5]["operation_metrics"]["numDeletedRows"] == 1
    assert h[6]["operation_params"] == {"sort_by": ["k"]}
    assert h[7]["operation_params"] == {"to_version": 5}
    assert h[1]["operation_metrics"]["numFiles"] >= 1
    assert h[2]["operation_params"]["key"] == "k"


def test_history_snapshot_and_clone_ops(spark, tmp_path):
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.clone import shallow_clone

    td = str(tmp_path / "t")
    df = spark.createDataFrame([(1, 10)], "k int, v int")
    append_version(df, td)
    write_version(df, td)  # snapshot: no manifest, no op record
    ops = _ops(td)
    assert ops[1] == "APPEND" and ops[2] is None
    c = str(tmp_path / "c")
    shallow_clone(spark, td, c)
    hc = history(c)[0]
    assert hc["operation"] == "CLONE"
    assert hc["operation_params"] == {"source_version": 2,
                                      "deep": False}


def test_history_write_face_ops(spark, tmp_path):
    from esg_decarbonization_data_integration_and_data_pipline_spark.sources.versioned_source import (
        register,
    )

    register(spark)
    td = str(tmp_path / "t")
    df = spark.createDataFrame([(1, 10)], "k int, v int")
    (df.write.format("versioned_table")
     .option("path", td).mode("append").save())
    ops = _ops(td)
    assert ops[1] == "WRITE"
    h1 = history(td)[0]
    assert h1["operation_params"]["face"] == "format(versioned_table)"
