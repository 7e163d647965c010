"""Column mapping: zero-copy RENAME COLUMN (the Delta column-mapping
``name`` mode shape).

Design under test (io/versioned.py):
- manifests and every metadata query speak LOGICAL names; parquet
  files speak PHYSICAL names.  The mapping lives in the pinned
  schema's per-field metadata (``{"physical": ...}``); an absent key
  means identity, so a never-renamed table is bit-identical to the
  pre-mapping format.
- ``rename_column`` is a metadata-only commit: data files inherited
  by reference, stats/rowmeta manifest lines re-keyed to the new
  logical name, the renamed field's physical name pinned to what the
  files actually carry.
- ALL writers stage logical->physical (append/compact/merge), so
  files stay physically consistent across the rename; new columns
  added to a mapped table get fresh, never-reused physical names
  (re-adding a dropped/renamed name cannot resurface old bytes --
  the documented caveat of the unmapped format).
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
    SchemaMismatchError,
    _count_where_plan,
    _data_files,
    append_version,
    column_range,
    compact_table,
    count_nulls,
    count_where,
    current_version,
    drop_columns,
    read_changes,
    read_current,
    read_version,
    read_where,
    rename_column,
    restore_table,
    table_schema,
    write_version,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _mk(spark, td, rows=((1, "a", 10), (2, "b", 20)),
        stats_columns=("k",)):
    df = spark.createDataFrame(list(rows), "k bigint, s string, v bigint")
    return append_version(df, td, stats_columns=stats_columns)


def _own_files(td: str, n: int) -> list[str]:
    vdir = f"v_{n:08d}"
    return [f for f in _data_files(td, n) if f.startswith(vdir)]


def _physical_names(td: str, rel: str) -> list[str]:
    return pq.ParquetFile(os.path.join(td, rel)).schema_arrow.names


# ------------------------------------------------------------ core


def test_rename_then_read_current(spark, tmp_path):
    td = str(tmp_path / "t")
    _mk(spark, td)
    n = rename_column(spark, td, "v", "value")
    assert current_version(td) == n
    df = read_current(spark, td)
    assert df.columns == ["k", "s", "value"]
    assert _rows(df) == [(1, "a", 10), (2, "b", 20)]


def test_rename_is_metadata_only(spark, tmp_path):
    td = str(tmp_path / "t")
    base = _mk(spark, td)
    files_before = _data_files(td, base)
    n = rename_column(spark, td, "v", "value")
    # the rename version holds NO data files of its own and inherits
    # the base's files by reference, byte-identical
    assert _own_files(td, n) == []
    assert _data_files(td, n) == files_before
    # files on disk still carry the ORIGINAL (physical) column name
    assert _physical_names(td, files_before[0]) == ["k", "s", "v"]


def test_time_travel_shows_pre_rename_name(spark, tmp_path):
    td = str(tmp_path / "t")
    base = _mk(spark, td)
    rename_column(spark, td, "v", "value")
    old = read_version(spark, td, base)
    assert old.columns == ["k", "s", "v"]
    assert _rows(old) == [(1, "a", 10), (2, "b", 20)]


def test_rename_chain_keeps_original_physical(spark, tmp_path):
    td = str(tmp_path / "t")
    _mk(spark, td)
    rename_column(spark, td, "v", "value")
    n = rename_column(spark, td, "value", "amount")
    st = table_schema(td, n)
    assert st.fieldNames() == ["k", "s", "amount"]
    assert st["amount"].metadata["physical"] == "v"
    assert _rows(read_current(spark, td)) == [(1, "a", 10), (2, "b", 20)]


def test_rename_errors(spark, tmp_path):
    td = str(tmp_path / "t")
    _mk(spark, td)
    with pytest.raises(ValueError, match="not in the current schema"):
        rename_column(spark, td, "nope", "x")
    with pytest.raises(ValueError, match="already a column"):
        rename_column(spark, td, "v", "s")
    with pytest.raises(ValueError, match="itself"):
        rename_column(spark, td, "v", "v")


def test_rename_constrained_column_refused(spark, tmp_path):
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.constraints import (
        set_table_constraints,
    )
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.expectations import (
        not_null,
    )

    td = str(tmp_path / "t")
    _mk(spark, td)
    set_table_constraints(spark, td, [not_null("v")])
    with pytest.raises(ValueError, match="constraint"):
        rename_column(spark, td, "v", "value")


# --------------------------------------------------- writers remap


def test_append_after_rename_stages_physical(spark, tmp_path):
    td = str(tmp_path / "t")
    _mk(spark, td)
    rename_column(spark, td, "v", "value")
    batch = spark.createDataFrame([(3, "c", 30)],
                                  "k bigint, s string, value bigint")
    n = append_version(batch, td)
    own = _own_files(td, n)
    assert own, "append must stage its own files"
    # staged parquet carries the PHYSICAL name so every file of the
    # table stays physically consistent
    for rel in own:
        assert _physical_names(td, rel) == ["k", "s", "v"]
    assert _rows(read_current(spark, td)) == [
        (1, "a", 10), (2, "b", 20), (3, "c", 30)]


def test_append_old_name_after_rename_is_schema_mismatch(spark, tmp_path):
    td = str(tmp_path / "t")
    _mk(spark, td)
    rename_column(spark, td, "v", "value")
    batch = spark.createDataFrame([(3, "c", 30)],
                                  "k bigint, s string, v bigint")
    with pytest.raises(SchemaMismatchError):
        append_version(batch, td)


def test_merge_schema_add_after_rename_gets_fresh_physical(spark, tmp_path):
    td = str(tmp_path / "t")
    _mk(spark, td)
    rename_column(spark, td, "v", "value")
    batch = spark.createDataFrame(
        [(3, "c", 30, 7.5)],
        "k bigint, s string, value bigint, score double")
    n = append_version(batch, td, merge_schema=True)
    st = table_schema(td, n)
    assert st.fieldNames() == ["k", "s", "value", "score"]
    phys = st["score"].metadata.get("physical", "score")
    own = _own_files(td, n)
    assert phys in _physical_names(td, own[0])
    got = _rows(read_current(spark, td).select("k", "value", "score"))
    assert got == [(1, 10, None), (2, 20, None), (3, 30, 7.5)]


def test_readding_renamed_away_name_does_not_resurface(spark, tmp_path):
    """rename v->value, then merge-add a NEW column named v: the old
    files' physical column 'v' must NOT leak into the new logical
    'v' -- pre-add rows read NULL (the unmapped format's documented
    resurface caveat is fixed by fresh physicals)."""
    td = str(tmp_path / "t")
    _mk(spark, td)
    rename_column(spark, td, "v", "value")
    batch = spark.createDataFrame(
        [(3, "c", 30, 99)],
        "k bigint, s string, value bigint, v bigint")
    append_version(batch, td, merge_schema=True)
    got = _rows(read_current(spark, td).select("k", "value", "v"))
    assert got == [(1, 10, None), (2, 20, None), (3, 30, 99)]


def test_compact_after_rename_rewrites_physical_and_keeps_mapping(
        spark, tmp_path):
    td = str(tmp_path / "t")
    _mk(spark, td)
    rename_column(spark, td, "v", "value")
    n = compact_table(spark, td, stats_columns=("k", "value"))
    st = table_schema(td, n)
    assert st["value"].metadata["physical"] == "v"
    for rel in _own_files(td, n):
        assert "v" in _physical_names(td, rel)
        assert "value" not in _physical_names(td, rel)
    assert _rows(read_current(spark, td)) == [(1, "a", 10), (2, "b", 20)]


# ------------------------------------------- metadata-query remap


def test_stats_rekeyed_and_metadata_queries_answer(spark, tmp_path):
    td = str(tmp_path / "t")
    base = _mk(spark, td, rows=[(i, "x", i * 10) for i in range(1, 9)],
               stats_columns=("k", "v"))
    n = rename_column(spark, td, "v", "value")
    assert column_range(spark, td, "value") == (10, 80)
    assert count_where(spark, td, "value", lo=30, hi=50) == 3
    assert count_nulls(spark, td, "value") == 0
    # pruning still plans from the re-keyed manifest stats: a range
    # provably outside every file's [min,max] scans nothing
    meta_rows, boundary = _count_where_plan(td, n, "value", 1000, 2000)
    assert meta_rows == 0 and boundary == []
    got = _rows(read_where(spark, td, "value", lo=30, hi=50)
                .select("k", "value"))
    assert got == [(3, 30), (4, 40), (5, 50)]
    # the old name no longer answers
    with pytest.raises(ValueError):
        count_nulls(spark, td, "v")
    # time travel still answers under the OLD name at the old version
    assert column_range(spark, td, "v", n=base) == (10, 80)


# ------------------------------------------------ DDL interplay


def test_drop_after_rename(spark, tmp_path):
    td = str(tmp_path / "t")
    _mk(spark, td)
    rename_column(spark, td, "v", "value")
    drop_columns(spark, td, ["value"])
    df = read_current(spark, td)
    assert df.columns == ["k", "s"]
    assert _rows(df) == [(1, "a"), (2, "b")]


def test_restore_across_rename(spark, tmp_path):
    td = str(tmp_path / "t")
    base = _mk(spark, td)
    rename_column(spark, td, "v", "value")
    restore_table(spark, td, base)
    df = read_current(spark, td)
    assert df.columns == ["k", "s", "v"]
    assert _rows(df) == [(1, "a", 10), (2, "b", 20)]


def test_rename_carries_txn_markers(spark, tmp_path):
    td = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a", 10)],
                               "k bigint, s string, v bigint")
    append_version(df, td, txn="job:1")
    rename_column(spark, td, "v", "value")
    batch = spark.createDataFrame([(9, "z", 90)],
                                  "k bigint, s string, value bigint")
    n = append_version(batch, td, txn="job:1")  # replay -> no-op
    assert n == current_version(td)
    assert _rows(read_current(spark, td)) == [(1, "a", 10)]


def test_snapshot_resets_mapping(spark, tmp_path):
    td = str(tmp_path / "t")
    _mk(spark, td)
    rename_column(spark, td, "v", "value")
    snap = spark.createDataFrame([(5, "e", 50)],
                                 "k bigint, s string, value bigint")
    n = write_version(snap, td)
    st = table_schema(td, n)
    assert st["value"].metadata.get("physical") is None
    assert _physical_names(td, _own_files(td, n)[0])[:3] == \
        ["k", "s", "value"]
    assert _rows(read_current(spark, td)) == [(5, "e", 50)]


def test_read_changes_across_rename_uses_current_names(spark, tmp_path):
    td = str(tmp_path / "t")
    base = _mk(spark, td)
    rename_column(spark, td, "v", "value")
    batch = spark.createDataFrame([(3, "c", 30)],
                                  "k bigint, s string, value bigint")
    n = append_version(batch, td)
    ch = read_changes(spark, td, base, n)
    assert set(ch.columns) == {"k", "s", "value", "_change_type"}
    assert _rows(ch.select("k", "value", "_change_type")) == [
        (3, 30, "insert")]


# --------------------------------------------------- erasure (GDPR)


def test_purge_across_rename_removes_pre_rename_rows(spark, tmp_path):
    """THE compliance case that gates column mapping: files written
    BEFORE the rename carry the key under its old physical name; a
    purge issued under the NEW logical name must still erase those
    rows from every readable version."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.purge import (
        assert_keys_absent,
        count_keys_all_versions,
        purge_keys_history,
    )

    td = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, f"u{i}", i * 10) for i in range(1, 6)],
        "uid bigint, name string, v bigint")
    append_version(df, td, stats_columns=("uid",))
    rename_column(spark, td, "uid", "subject_id")
    batch = spark.createDataFrame(
        [(9, "u9", 90)], "subject_id bigint, name string, v bigint")
    append_version(batch, td, stats_columns=("subject_id",))

    before = count_keys_all_versions(spark, td, "subject_id", [3, 9])
    assert sum(before.values()) > 0
    res = purge_keys_history(spark, td, "subject_id", [3, 9])
    assert res["rows_purged"] >= 2
    assert_keys_absent(spark, td, "subject_id", [3, 9])
    # every version still readable, under its own era's column name
    assert _rows(read_current(spark, td).select("subject_id")) == [
        (1,), (2,), (4,), (5,)]
    assert _rows(read_version(spark, td, 1).select("uid")) == [
        (1,), (2,), (4,), (5,)]


def test_purge_after_rename_keeps_metadata_queries_working(
        spark, tmp_path):
    """Phase-3 metadata re-record must translate footer (physical)
    stats back to each version's own logical names -- the re-added
    lines keep count_where answering from metadata on both sides of
    the rename."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.purge import (
        purge_keys_history,
    )

    td = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, "x", i * 10) for i in range(1, 9)],
        "k bigint, s string, v bigint")
    append_version(df, td, stats_columns=("k",))
    base = current_version(td)
    rename_column(spark, td, "k", "key_id")
    purge_keys_history(spark, td, "key_id", [2])
    assert count_where(spark, td, "key_id", lo=1, hi=4) == 3
    assert count_where(spark, td, "k", lo=1, hi=4, n=base) == 3
    assert column_range(spark, td, "key_id") == (1, 8)


# --------------------------------------------- bloom / fsck remap


def test_bloom_sidecars_survive_rename(spark, tmp_path):
    """Sidecars are keyed by the stable PHYSICAL name: a rename
    invalidates nothing and probes under the new logical name keep
    pruning with the pre-rename sidecars."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.bloom_index import (
        build_bloom_index,
        consolidate_bloom_index,
        lookup_files,
        point_lookup,
    )

    td = str(tmp_path / "t")
    a = spark.createDataFrame([(i, "x") for i in range(10)],
                              "k bigint, s string")
    b = spark.createDataFrame([(i, "y") for i in range(100, 110)],
                              "k bigint, s string")
    append_version(a.coalesce(1), td)
    append_version(b.coalesce(1), td)
    built = build_bloom_index(spark, td, "k")
    assert built == 2
    rename_column(spark, td, "k", "kid")
    # no rebuild needed: new-name probes resolve the same physical
    assert build_bloom_index(spark, td, "kid") == 0
    files = lookup_files(td, "kid", 105)
    assert len(files) == 1
    got = _rows(point_lookup(spark, td, "kid", 105).select("kid"))
    assert got == [(105,)]
    # consolidated index (keyed by the physical name) answers the
    # same as the per-file sidecars did
    per_file = lookup_files(td, "kid", 3)
    consolidate_bloom_index(td, "kid")
    assert lookup_files(td, "kid", 3) == per_file
    assert len(per_file) == 1


def test_fsck_verify_and_repair_across_rename(spark, tmp_path):
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.fsck import (
        repair_table,
        verify_table,
    )

    td = str(tmp_path / "t")
    _mk(spark, td, rows=[(i, "x", i) for i in range(1, 9)],
        stats_columns=("k", "v"))
    rename_column(spark, td, "v", "value")
    append_version(
        spark.createDataFrame([(9, "y", 9)],
                              "k bigint, s string, value bigint"),
        td, stats_columns=("k", "value"))
    rep = verify_table(spark, td)
    assert rep["ok"], rep
    # repair keeps each version's own logical names and the table
    # still answers metadata queries afterwards
    out = repair_table(spark, td)
    assert not out["unrepairable"]
    rep2 = verify_table(spark, td)
    assert rep2["ok"], rep2
    assert column_range(spark, td, "value") == (1, 9)
    assert count_where(spark, td, "value", lo=2, hi=4) == 3


# ------------------------------------------------ DataSource faces


def test_datasource_batch_read_after_rename(spark, tmp_path):
    from esg_decarbonization_data_integration_and_data_pipline_spark.sources.versioned_source import (
        register,
    )

    register(spark)
    td = str(tmp_path / "t")
    _mk(spark, td)
    base = current_version(td)
    rename_column(spark, td, "v", "value")
    cur = (spark.read.format("versioned_table")
           .option("path", td).load())
    assert cur.columns == ["k", "s", "value"]
    assert _rows(cur) == [(1, "a", 10), (2, "b", 20)]
    old = (spark.read.format("versioned_table")
           .option("path", td).option("version", str(base)).load())
    assert old.columns == ["k", "s", "v"]
    assert _rows(old) == [(1, "a", 10), (2, "b", 20)]


def test_datasource_pushdown_after_rename(spark, tmp_path):
    """Pushed filters on the NEW logical name keep pruning: manifest
    stats were re-keyed, bloom consults resolve the physical name,
    and the executor row pre-filter runs on the aligned (logical)
    batch."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.sources.versioned_source import (
        register,
    )

    register(spark)
    td = str(tmp_path / "t")
    a = spark.createDataFrame([(i, "x", i * 10) for i in range(1, 5)],
                              "k bigint, s string, v bigint")
    b = spark.createDataFrame(
        [(i, "y", i * 10) for i in range(100, 105)],
        "k bigint, s string, v bigint")
    append_version(a.coalesce(1), td, stats_columns=("v",))
    append_version(b.coalesce(1), td, stats_columns=("v",))
    rename_column(spark, td, "v", "value")
    df = (spark.read.format("versioned_table")
          .option("path", td).option("pushdown", "true").load()
          .filter("value >= 1000"))
    assert _rows(df.select("k", "value")) == [
        (i, i * 10) for i in range(100, 105)]


def test_datasource_write_append_on_mapped_table(spark, tmp_path):
    from esg_decarbonization_data_integration_and_data_pipline_spark.sources.versioned_source import (
        register,
    )

    register(spark)
    td = str(tmp_path / "t")
    _mk(spark, td)
    rename_column(spark, td, "v", "value")
    batch = spark.createDataFrame([(3, "c", 30)],
                                  "k bigint, s string, value bigint")
    (batch.write.format("versioned_table")
     .option("path", td).mode("append").save())
    n = current_version(td)
    own = _own_files(td, n)
    assert own
    for rel in own:
        assert "v" in _physical_names(td, rel)
        assert "value" not in _physical_names(td, rel)
    assert _rows(read_current(spark, td)) == [
        (1, "a", 10), (2, "b", 20), (3, "c", 30)]
    # and the format() read agrees
    got = (spark.read.format("versioned_table")
           .option("path", td).load())
    assert _rows(got) == [(1, "a", 10), (2, "b", 20), (3, "c", 30)]


def test_datasource_cdf_across_rename_emits_current_names(
        spark, tmp_path):
    from esg_decarbonization_data_integration_and_data_pipline_spark.sources.versioned_source import (
        register,
    )

    register(spark)
    td = str(tmp_path / "t")
    base = _mk(spark, td)
    rename_column(spark, td, "v", "value")
    append_version(
        spark.createDataFrame([(3, "c", 30)],
                              "k bigint, s string, value bigint"),
        td)
    ch = (spark.read.format("versioned_table")
          .option("path", td).option("readChangeFeed", "true")
          .option("startingVersion", str(base)).load())
    assert "value" in ch.columns and "v" not in ch.columns
    rows = [(r.k, r.value, r._change_type) for r in ch.collect()]
    # the rename commit itself plans to NOTHING (row-identical);
    # only the append's insert surfaces
    assert sorted(rows) == [(3, 30, "insert")]


# ------------------------------------------------------ plan shape


def test_mapped_read_plans_like_unmapped(spark, tmp_path):
    """The alias-back projection is free: filters push down to the
    parquet scan under the PHYSICAL name and column pruning reaches
    the scan -- a mapped read plans identically to an unmapped one
    (pinned on executedPlan, the canonical single-listing form)."""
    from pyspark.sql import functions as F

    td = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, "x", i * 10) for i in range(100)],
        "k bigint, s string, v bigint")
    append_version(df, td, stats_columns=["v"])
    rename_column(spark, td, "v", "value")
    q = (read_current(spark, td)
         .filter(F.col("value") > 500).select("k", "value"))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(v), GreaterThan(v,500)]" in plan
    assert "ReadSchema: struct<k:bigint,v:bigint>" in plan  # s pruned
    assert _rows(q) == [(i, i * 10) for i in range(51, 100)]


def test_describe_table_surfaces_mapping(spark, tmp_path):
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import describe_table

    td = str(tmp_path / "t")
    _mk(spark, td)
    assert describe_table(td)["column_mapping"] == {}
    rename_column(spark, td, "v", "value")
    assert describe_table(td)["column_mapping"] == {"value": "v"}
