"""Spark-4 Python DataSource over versioned tables
(sources/versioned_source): batch time travel through format(...),
append-only streaming tail with engine-checkpointed offsets, the
rewrite refusal / skipChangeCommits contract, and schema-evolution
alignment."""

from __future__ import annotations

import pytest

from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
    append_version,
    compact_table,
    current_version,
    merge_version,
)
from esg_decarbonization_data_integration_and_data_pipline_spark.sources.versioned_source import (
    register,
)


def _kv(spark, pairs):
    return spark.createDataFrame(pairs, "k bigint, v string")


@pytest.fixture()
def registered(spark):
    register(spark)
    return spark


def _build(spark, tmp_path):
    td = str(tmp_path / "t")
    append_version(_kv(spark, [(1, "a"), (2, "b")]).coalesce(1), td,
                   stats_columns=["k"])
    append_version(_kv(spark, [(3, "c")]).coalesce(1), td)
    return td


def test_batch_read_current_and_time_travel(registered, tmp_path):
    spark = registered
    td = _build(spark, tmp_path)
    cur = (spark.read.format("versioned_table")
           .option("path", td).load())
    assert sorted((r.k, r.v) for r in cur.collect()) == [
        (1, "a"), (2, "b"), (3, "c")]
    v1 = (spark.read.format("versioned_table")
          .option("path", td).option("version", "1").load())
    assert sorted((r.k, r.v) for r in v1.collect()) == [
        (1, "a"), (2, "b")]


def test_batch_read_aligns_evolved_schema(registered, tmp_path):
    spark = registered
    td = str(tmp_path / "t")
    append_version(_kv(spark, [(1, "a")]).coalesce(1), td)
    append_version(
        spark.createDataFrame([(2, "b", 9.0)],
                              "k bigint, v string, w double"),
        td, merge_schema=True)
    got = sorted(
        ((r.k, r.v, r.w) for r in
         spark.read.format("versioned_table")
         .option("path", td).load().collect()))
    # the pre-evolution file surfaces w as NULL
    assert got == [(1, "a", None), (2, "b", 9.0)]


def test_stream_tails_appends_exactly_once(registered, tmp_path):
    spark = registered
    td = _build(spark, tmp_path)
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    def drain():
        q = (spark.readStream.format("versioned_table")
             .option("path", td).load()
             .writeStream.format("parquet")
             .option("path", out)
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    drain()
    got = sorted((r.k, r.v)
                 for r in spark.read.parquet(out).collect())
    assert got == [(1, "a"), (2, "b"), (3, "c")]
    # restart with no new commits: nothing re-emitted
    drain()
    assert spark.read.parquet(out).count() == 3
    # a new append emits exactly its own rows
    append_version(_kv(spark, [(4, "d")]).coalesce(1), td)
    drain()
    got = sorted((r.k, r.v)
                 for r in spark.read.parquet(out).collect())
    assert got == [(1, "a"), (2, "b"), (3, "c"), (4, "d")]


def test_stream_refuses_rewrites_unless_skipping(registered, tmp_path):
    spark = registered
    td = _build(spark, tmp_path)
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")

    def drain(skip=False):
        r = (spark.readStream.format("versioned_table")
             .option("path", td))
        if skip:
            r = r.option("skipChangeCommits", "true")
        q = (r.load().writeStream.format("parquet")
             .option("path", out)
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    drain()
    merge_version(spark, td, _kv(spark, [(1, "A2")]), "k")
    with pytest.raises(Exception, match="skipChangeCommits"):
        drain()
    # skipping: the rewrite commit contributes nothing, the stream
    # continues past it.  An availableNow restart first COMPLETES
    # the pending failed batch (standard Structured Streaming
    # semantics -- its captured end offset predates the new append),
    # so the fresh tail arrives on the following trigger.
    append_version(_kv(spark, [(9, "z")]).coalesce(1), td)
    drain(skip=True)   # replays the pending (v2, v3] batch: skipped
    drain(skip=True)   # tails (v3, v4]
    got = sorted((r.k, r.v)
                 for r in spark.read.parquet(out).collect())
    assert got == [(1, "a"), (2, "b"), (3, "c"), (9, "z")]


def test_stream_skips_compactions_without_data_loss(registered,
                                                    tmp_path):
    """A compaction rewrites everything but changes no rows: with
    skipChangeCommits the stream loses nothing it had not already
    emitted, and appends after the compaction keep flowing."""
    spark = registered
    td = _build(spark, tmp_path)
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")

    def drain():
        q = (spark.readStream.format("versioned_table")
             .option("path", td)
             .option("skipChangeCommits", "true").load()
             .writeStream.format("parquet")
             .option("path", out)
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    drain()
    compact_table(spark, td)
    append_version(_kv(spark, [(4, "d")]).coalesce(1), td)
    drain()
    got = sorted((r.k, r.v)
                 for r in spark.read.parquet(out).collect())
    assert got == [(1, "a"), (2, "b"), (3, "c"), (4, "d")]


def test_starting_version_option(registered, tmp_path):
    spark = registered
    td = _build(spark, tmp_path)
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (spark.readStream.format("versioned_table")
         .option("path", td)
         .option("startingVersion", str(current_version(td) - 1))
         .load()
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = sorted((r.k, r.v)
                 for r in spark.read.parquet(out).collect())
    assert got == [(3, "c")]  # only the tail past the start version


def test_vacuumed_diff_base_refuses_instead_of_duplicating(
        registered, tmp_path):
    """A lagging checkpoint whose diff base was vacuumed must FAIL
    (retention contract), never fall back to 'everything is new' --
    that fallback would silently re-emit every inherited row."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import vacuum

    spark = registered
    td = _build(spark, tmp_path)  # v1, v2
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")

    def drain():
        q = (spark.readStream.format("versioned_table")
             .option("path", td).load()
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    drain()  # checkpoint now at v2
    # a compaction breaks the inheritance chain (its files are its
    # own), so vacuum can actually reap the early dirs -- on a pure
    # append chain everything stays pinned and no hazard exists
    compact_table(spark, td)                                 # v3
    append_version(_kv(spark, [(5, "e")]).coalesce(1), td)   # v4
    vacuum(td, keep_last=2, stage_ttl_seconds=0)  # reaps v1, v2
    with pytest.raises(Exception, match="diff base"):
        drain()
    # and nothing was duplicated into the sink by the failed attempt
    assert spark.read.parquet(out).count() == 3


def test_fresh_start_on_vacuumed_prefix_table(registered, tmp_path):
    """The default initial snapshot works even when the table's
    early versions are long vacuumed: the snapshot marker makes the
    unreadable prefix expected, and the first readable version
    emits in full."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import vacuum

    spark = registered
    td = _build(spark, tmp_path)          # v1, v2
    compact_table(spark, td)              # v3 (snapshot)
    vacuum(td, keep_last=1, stage_ttl_seconds=0)  # only v3 readable
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck2")
    q = (spark.readStream.format("versioned_table")
         .option("path", td).load()
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = sorted((r.k, r.v) for r in spark.read.parquet(out).collect())
    assert got == [(1, "a"), (2, "b"), (3, "c")]
