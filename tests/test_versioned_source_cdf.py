"""Row-level change feed through the Python DataSource
(sources/versioned_source, ``readChangeFeed``): batch and streaming
faces, delete/insert attribution per commit, compaction silence,
schema-evolution alignment, and the option contracts."""

from __future__ import annotations

import pytest

from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
    append_version,
    compact_table,
    delete_keys_version,
    merge_version,
)
from esg_decarbonization_data_integration_and_data_pipline_spark.sources.versioned_source import (
    register,
)


def _kv(spark, pairs, schema="k bigint, v string"):
    return spark.createDataFrame(pairs, schema)


@pytest.fixture()
def registered(spark):
    register(spark)
    return spark


def _build(spark, tmp_path):
    """v1 append {1,2}; v2 append {3}; v3 delete k=1; v4 merge-update
    k=2 -> B2."""
    td = str(tmp_path / "t")
    append_version(_kv(spark, [(1, "a"), (2, "b")]).coalesce(1), td,
                   stats_columns=["k"])
    append_version(_kv(spark, [(3, "c")]).coalesce(1), td)
    delete_keys_version(spark, td,
                        _kv(spark, [(1, "a")]).select("k"), "k")
    merge_version(spark, td, _kv(spark, [(2, "B2")]), "k")
    return td


def _changes(df):
    return sorted((r.k, r.v, r._change_type, r._commit_version)
                  for r in df.collect())


def test_batch_cdf_attributes_every_commit(registered, tmp_path):
    spark = registered
    td = _build(spark, tmp_path)
    got = _changes(
        spark.read.format("versioned_table").option("path", td)
        .option("readChangeFeed", "true")
        .option("startingVersion", "0").load())
    assert got == [
        (1, "a", "delete", 3),
        (1, "a", "insert", 1),
        (2, "B2", "insert", 4),
        (2, "b", "delete", 4),
        (2, "b", "insert", 1),
        (3, "c", "insert", 2),
    ]


def test_batch_cdf_range_and_ending_version(registered, tmp_path):
    spark = registered
    td = _build(spark, tmp_path)
    got = _changes(
        spark.read.format("versioned_table").option("path", td)
        .option("readChangeFeed", "true")
        .option("startingVersion", "2")
        .option("endingVersion", "3").load())
    assert got == [(1, "a", "delete", 3)]


def test_batch_cdf_requires_starting_version(registered, tmp_path):
    spark = registered
    td = _build(spark, tmp_path)
    with pytest.raises(Exception, match="startingVersion"):
        (spark.read.format("versioned_table").option("path", td)
         .option("readChangeFeed", "true").load().collect())


def test_cdf_compaction_plans_to_nothing(registered, tmp_path):
    spark = registered
    td = _build(spark, tmp_path)
    n = compact_table(spark, td)
    got = _changes(
        spark.read.format("versioned_table").option("path", td)
        .option("readChangeFeed", "true")
        .option("startingVersion", "4")
        .option("endingVersion", str(n)).load())
    assert got == []  # row-identical #base commit: silent by design


def test_stream_cdf_tails_rewrites(registered, tmp_path):
    spark = registered
    td = _build(spark, tmp_path)
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")

    def drain():
        q = (spark.readStream.format("versioned_table")
             .option("path", td)
             .option("readChangeFeed", "true").load()
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    drain()
    got = _changes(spark.read.parquet(out))
    # initial snapshot starts BEFORE the first readable version, so
    # the full history surfaces: same multiset as the batch face
    assert got == [
        (1, "a", "delete", 3),
        (1, "a", "insert", 1),
        (2, "B2", "insert", 4),
        (2, "b", "delete", 4),
        (2, "b", "insert", 1),
        (3, "c", "insert", 2),
    ]
    # restart: nothing re-emitted; a new delete arrives as one change
    drain()
    assert spark.read.parquet(out).count() == 6
    delete_keys_version(spark, td,
                        _kv(spark, [(3, "c")]).select("k"), "k")
    drain()
    got = _changes(spark.read.parquet(out))
    assert (3, "c", "delete", 5) in got and len(got) == 7


def test_stream_cdf_conflicts_with_skip(registered, tmp_path):
    spark = registered
    td = _build(spark, tmp_path)
    with pytest.raises(Exception, match="mutually exclusive"):
        (spark.readStream.format("versioned_table")
         .option("path", td).option("readChangeFeed", "true")
         .option("skipChangeCommits", "true").load()
         .writeStream.format("noop")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start().awaitTermination())


def test_cdf_aligns_evolved_schema(registered, tmp_path):
    """Changes are aligned to the ENDING version's pinned schema:
    pre-evolution rows surface the new column as NULL on both the
    delete and insert sides of a rewrite."""
    spark = registered
    td = str(tmp_path / "t")
    append_version(_kv(spark, [(1, "a"), (2, "b")]).coalesce(1), td,
                   stats_columns=["k"])
    append_version(
        spark.createDataFrame([(3, "c", 9.0)],
                              "k bigint, v string, w double"),
        td, merge_schema=True)
    delete_keys_version(spark, td,
                        _kv(spark, [(1, "a")]).select("k"), "k")
    got = sorted((r.k, r.v, r.w, r._change_type, r._commit_version)
                 for r in spark.read.format("versioned_table")
                 .option("path", td)
                 .option("readChangeFeed", "true")
                 .option("startingVersion", "1").load().collect())
    assert got == [
        (1, "a", None, "delete", 3),
        (3, "c", 9.0, "insert", 2),
    ]


def test_cdf_large_rewrite_diff_is_sharded(registered, tmp_path,
                                           monkeypatch):
    """A rewrite commit past the shard threshold diffs across
    MULTIPLE bucketed partitions with identical results -- bounded
    per-task memory for full-table overwrites (threshold forced tiny
    so the sharded path actually runs)."""
    import esg_decarbonization_data_integration_and_data_pipline_spark.sources.versioned_source as vs

    spark = registered
    td = str(tmp_path / "t")
    append_version(
        spark.createDataFrame([(k, f"v{k}") for k in range(200)],
                              "k bigint, v string").coalesce(1), td,
        stats_columns=["k"])
    delete_keys_version(
        spark, td,
        spark.createDataFrame([(k,) for k in range(0, 200, 3)],
                              "k bigint"), "k")
    expect = _changes(
        spark.read.format("versioned_table").option("path", td)
        .option("readChangeFeed", "true")
        .option("startingVersion", "1").load())
    assert len(expect) == 67  # the deleted keys only
    monkeypatch.setattr(vs, "_DIFF_SHARD_BYTES", 1024)
    parts = vs._plan_change_commits(
        td, 1, 2, vs._arrow_schema_bytes(
            vs._pinned_schema(td, 2)))
    assert len(parts) > 1  # genuinely sharded
    assert {p.bucket for p in parts} == set(range(parts[0].n_buckets))
    sharded = sorted(
        (row[0].as_py(), row[1].as_py(), row[2].as_py(),
         row[3].as_py())
        for p in parts
        for b in vs._read_change_part(p)
        for row in zip(*[b.column(i) for i in range(4)]))
    assert sharded == expect


def test_cdf_reserves_change_column_names(registered, tmp_path):
    """A table already carrying _change_type (e.g. a persisted CDF
    read) must refuse loudly, not produce a duplicate-name schema."""
    spark = registered
    td = str(tmp_path / "t")
    append_version(
        spark.createDataFrame([(1, "insert")],
                              "k bigint, _change_type string"), td)
    with pytest.raises(Exception, match="reserves column names"):
        (spark.read.format("versioned_table").option("path", td)
         .option("readChangeFeed", "true")
         .option("startingVersion", "0").load().collect())


def test_cdf_matches_read_changes(registered, tmp_path):
    """The format() face and io.versioned.read_changes agree on the
    same (from, to] delta (modulo the extra _commit_version col)."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import read_changes

    spark = registered
    td = _build(spark, tmp_path)
    face = sorted(
        (r.k, r.v, r._change_type)
        for r in spark.read.format("versioned_table")
        .option("path", td).option("readChangeFeed", "true")
        .option("startingVersion", "2").load().collect())
    direct = sorted((r.k, r.v, r._change_type)
                    for r in read_changes(spark, td, 2).collect())
    assert face == direct
