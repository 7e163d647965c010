"""Pinning tests for the column-mapping review pass (r12
continuation): resurface-through-drop, stale-metadata stripping,
change-feed alias collisions, and the streaming write face's
cross-instance map agreement."""

from __future__ import annotations

import os

import pyarrow.parquet as pq

from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
    _data_files,
    _is_mapped,
    append_version,
    drop_columns,
    read_changes,
    read_current,
    rename_column,
    table_schema,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# ------------------------------------------------- r12c-1


def test_rename_drop_readd_does_not_resurface(spark, tmp_path):
    """rename x->z, drop z, then merge-add a NEW column named x: the
    mapped marker (identity pins on every field) must survive the
    drop, so the re-added logical x binds a FRESH physical and the
    pre-rename bytes stay buried."""
    td = str(tmp_path / "t")
    df = spark.createDataFrame([(1, 10), (2, 20)],
                               "k bigint, x bigint")
    append_version(df, td)
    rename_column(spark, td, "x", "z")
    drop_columns(spark, td, ["z"])
    st = table_schema(td, 3)
    assert _is_mapped(st), "mapped marker must survive the drop"
    batch = spark.createDataFrame([(3, 99)], "k bigint, x bigint")
    append_version(batch, td, merge_schema=True)
    got = _rows(read_current(spark, td).select("k", "x"))
    assert got == [(1, None), (2, None), (3, 99)]
    st = table_schema(td, 4)
    phys = (st["x"].metadata or {}).get("physical", "x")
    assert phys != "x", "re-added column must get a fresh physical"


# ------------------------------------------------- r12c-3


def test_stray_physical_metadata_stripped_on_unmapped_base(
        spark, tmp_path):
    """A df built from a MAPPED table's pinned schema appended to a
    fresh table must not pin physicals its own files don't carry --
    the column would silently read all-NULL."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    df = spark.createDataFrame([(1, 10)], "k bigint, v bigint")
    append_version(df, src)
    rename_column(spark, src, "v", "value")
    mapped_st = table_schema(src, 2)
    carried = spark.createDataFrame([(5, 50)], mapped_st)
    append_version(carried, dst)
    st = table_schema(dst, 1)
    assert not _is_mapped(st)
    assert _rows(read_current(spark, dst)) == [(5, 50)]


def test_write_version_strips_into_fresh_identity(spark, tmp_path):
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import write_version

    src = str(tmp_path / "src")
    append_version(
        spark.createDataFrame([(1, 10)], "k bigint, v bigint"), src)
    rename_column(spark, src, "v", "value")
    snap = spark.createDataFrame([(7, 70)], table_schema(src, 2))
    write_version(snap, src)
    assert not _is_mapped(table_schema(src, 3))
    assert _rows(read_current(spark, src)) == [(7, 70)]


# ------------------------------------------------- r12c-4


def test_cdf_alias_collision_with_stale_dropped_column(
        spark, tmp_path):
    """History: write x,y; rewrite; drop x; rename y->x.  The
    change-feed over the whole range must not produce two columns
    named x (the stale dropped one collides with the rename
    target)."""
    from pyspark.sql import functions as F

    td = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a"), (2, "b")],
                               "x bigint, y string")
    append_version(df, td)
    # rewrite so the fast append path cannot cover the whole range
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import merge_version

    merge_version(spark, td,
                  spark.createDataFrame([(1, "a2")],
                                        "x bigint, y string"), "x")
    drop_columns(spark, td, ["x"])
    rename_column(spark, td, "y", "x")
    ch = read_changes(spark, td, 1, 4)
    assert ch.columns.count("x") == 1
    # exactness: FOLD the feed onto v1's state (projected through the
    # physical chain: v1's y IS the current x) -- the result must be
    # exactly v4's state (review r12d-4: the prior assertion was
    # near-vacuous)
    from collections import Counter

    state = Counter(r["y"] for r in
                    spark.read.parquet(*[
                        __import__("os").path.join(td, f)
                        for f in _data_files(td, 1)]).collect())
    for r in ch.collect():
        if r["_change_type"] == "insert":
            state[r["x"]] += 1
        else:
            state[r["x"]] -= 1
    want = Counter(r["x"]
                   for r in read_current(spark, td).collect())
    assert Counter({k: c for k, c in state.items() if c}) == want
    assert sorted(want) == ["a2", "b"]


# ------------------------------------------- r12c-2 / r12c-5


def test_stream_writer_commit_uses_write_phase_map(spark, tmp_path):
    """Simulate the engine's separate write/commit writer instances
    with a rename landing in between: the commit must use the map
    the parts were ACTUALLY staged under (the marker file) and fail
    loudly on the raced base, never commit misnamed files."""
    import pyarrow as pa
    import pytest

    from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import VersionConflictError
    from esg_decarbonization_data_integration_and_data_pipline_spark.sources.versioned_source import (
        _VersionedStreamWriter,
    )

    td = str(tmp_path / "t")
    append_version(
        spark.createDataFrame([(1, 10)], "k bigint, v bigint"), td)
    schema = spark.createDataFrame([], "k bigint, v bigint").schema
    opts = {"path": td, "txnAppId": "job"}

    w_write = _VersionedStreamWriter(opts, schema, overwrite=False)
    msg = w_write.write(iter([pa.RecordBatch.from_pylist(
        [{"k": 2, "v": 20}],
        schema=pa.schema([("k", pa.int64()), ("v", pa.int64())]))]))
    assert os.path.exists(w_write._marker_path())

    rename_column(spark, td, "v", "value")

    w_commit = _VersionedStreamWriter(opts, schema, overwrite=False)
    with pytest.raises(VersionConflictError):
        w_commit.commit([msg], batchId=0)
    # the table is untouched by the failed commit
    assert read_current(spark, td).columns == ["k", "value"]
    assert _rows(read_current(spark, td)) == [(1, 10)]


def test_stream_writer_happy_path_on_mapped_table(spark, tmp_path):
    """No race: write + commit instances over a mapped base stage
    physical and commit cleanly, exactly-once."""
    import pyarrow as pa

    from esg_decarbonization_data_integration_and_data_pipline_spark.sources.versioned_source import (
        _VersionedStreamWriter,
    )

    td = str(tmp_path / "t")
    append_version(
        spark.createDataFrame([(1, 10)], "k bigint, v bigint"), td)
    rename_column(spark, td, "v", "value")
    schema = spark.createDataFrame([], "k bigint, value bigint").schema
    opts = {"path": td, "txnAppId": "job"}
    w_write = _VersionedStreamWriter(opts, schema, overwrite=False)
    msg = w_write.write(iter([pa.RecordBatch.from_pylist(
        [{"k": 2, "value": 20}],
        schema=pa.schema([("k", pa.int64()),
                          ("value", pa.int64())]))]))
    w_commit = _VersionedStreamWriter(opts, schema, overwrite=False)
    w_commit.commit([msg], batchId=0)
    n = 3
    own = [f for f in _data_files(td, n)
           if f.startswith(f"v_{n:08d}")]
    assert own
    names = pq.ParquetFile(os.path.join(td, own[0])).schema_arrow.names
    assert names == ["k", "v"], "parts must be staged physical"
    assert _rows(read_current(spark, td)) == [(1, 10), (2, 20)]
    # replay of the same batch is a no-op
    w2 = _VersionedStreamWriter(opts, schema, overwrite=False)
    msg2 = w2.write(iter([pa.RecordBatch.from_pylist(
        [{"k": 2, "value": 20}],
        schema=pa.schema([("k", pa.int64()),
                          ("value", pa.int64())]))]))
    w2c = _VersionedStreamWriter(opts, schema, overwrite=False)
    w2c.commit([msg2], batchId=0)
    assert _rows(read_current(spark, td)) == [(1, 10), (2, 20)]



# ------------------------------------------- r12d-1 / r12d-3


def test_zero_partition_batch_after_rename_does_not_wedge(
        spark, tmp_path):
    """The pending-dir map marker is consumed by every commit
    outcome: a later batch whose write phase never ran (zero
    partitions) must fall back to fresh init-computed state, not a
    previous batch's stale map -- a rename between batches used to
    crash-loop the query with a spurious VersionConflictError."""
    import pyarrow as pa

    from esg_decarbonization_data_integration_and_data_pipline_spark.sources.versioned_source import (
        _VersionedStreamWriter,
    )

    td = str(tmp_path / "t")
    append_version(
        spark.createDataFrame([(1, 10)], "k bigint, v bigint"), td)
    schema = spark.createDataFrame([], "k bigint, v bigint").schema
    opts = {"path": td, "txnAppId": "job"}
    w0 = _VersionedStreamWriter(opts, schema, overwrite=False)
    msg = w0.write(iter([pa.RecordBatch.from_pylist(
        [{"k": 2, "v": 20}],
        schema=pa.schema([("k", pa.int64()), ("v", pa.int64())]))]))
    w0c = _VersionedStreamWriter(opts, schema, overwrite=False)
    w0c.commit([msg], batchId=0)
    assert not os.path.exists(w0c._marker_path())
    rename_column(spark, td, "v", "value")
    # batch 1: zero partitions -> write() never runs; the commit
    # instance (built AFTER the rename, wide schema) must commit the
    # empty batch cleanly from its own fresh state
    schema2 = spark.createDataFrame([], "k bigint, value bigint").schema
    w1c = _VersionedStreamWriter({"path": td, "txnAppId": "job"},
                                 schema2, overwrite=False)
    w1c.commit([], batchId=1)
    assert _rows(read_current(spark, td)) == [(1, 10), (2, 20)]


def test_drop_of_only_pinned_field_keeps_marker(spark, tmp_path):
    """A table whose schema pins ONLY the renamed field (the
    pre-identity-stamping layout): dropping that field must still
    leave the table marked mapped, so a re-add of the old name binds
    a fresh physical instead of the old files' bytes."""
    import json

    from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
        _SCHEMA_FILE,
        current_version,
        table_schema,
    )

    td = str(tmp_path / "t")
    df = spark.createDataFrame([(1, 10), (2, 20)],
                               "k bigint, x bigint")
    append_version(df, td)
    rename_column(spark, td, "x", "z")
    # simulate the legacy single-pin layout: strip the identity pins
    n = current_version(td)
    p = os.path.join(td, f"v_{n:08d}", _SCHEMA_FILE)
    with open(p, encoding="utf-8") as fh:
        raw = json.load(fh)
    for fld in raw["fields"]:
        if fld["name"] != "z":
            fld["metadata"] = {}
    with open(p, "w", encoding="utf-8") as fh:
        json.dump(raw, fh)
    st = table_schema(td, n)
    assert [f.name for f in st.fields
            if "physical" in (f.metadata or {})] == ["z"]
    drop_columns(spark, td, ["z"])
    assert _is_mapped(table_schema(td, current_version(td)))
    batch = spark.createDataFrame([(3, 99)], "k bigint, x bigint")
    append_version(batch, td, merge_schema=True)
    got = _rows(read_current(spark, td).select("k", "x"))
    assert got == [(1, None), (2, None), (3, 99)]
