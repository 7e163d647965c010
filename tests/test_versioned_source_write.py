"""The versioned_table WRITE face (sources/versioned_source
_VersionedBatchWriter/_VersionedStreamWriter): append/overwrite
semantics, txn idempotence, schema enforcement/evolution, stats
recording, constraint refusal, and exactly-once streaming commits."""

from __future__ import annotations

import os

import pytest

from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
    append_version,
    committed_versions,
    current_version,
    read_current,
    read_version,
    table_rowcount,
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


def _w(df, td, mode="append"):
    (df.write.format("versioned_table").option("path", td)
       .mode(mode).save())


def test_batch_append_and_overwrite(registered, tmp_path):
    spark = registered
    td = str(tmp_path / "t")
    _w(_kv(spark, [(1, "a"), (2, "b")]), td)
    assert current_version(td) == 1
    _w(_kv(spark, [(3, "c")]), td)
    got = sorted((r.k, r.v) for r in read_current(spark, td).collect())
    assert got == [(1, "a"), (2, "b"), (3, "c")]
    # v1 time travel still sees the first commit only
    assert read_version(spark, td, 1).count() == 2
    # overwrite = snapshot version: history stays readable
    _w(_kv(spark, [(9, "z")]), td, mode="overwrite")
    assert sorted((r.k, r.v) for r in
                  read_current(spark, td).collect()) == [(9, "z")]
    assert read_version(spark, td, 2).count() == 3


def test_batch_write_interops_with_function_api(registered, tmp_path):
    """Versions committed by the write face and by append_version
    interleave on one table -- one commit protocol."""
    spark = registered
    td = str(tmp_path / "t")
    append_version(_kv(spark, [(1, "a")]), td, stats_columns=["k"])
    _w(_kv(spark, [(2, "b")]), td)
    append_version(_kv(spark, [(3, "c")]), td)
    assert committed_versions(td) == [1, 2, 3]
    assert read_current(spark, td).count() == 3
    # metadata rowcount works across both writers' versions
    assert table_rowcount(td, 3) == 3


def test_batch_txn_marker_is_idempotent(registered, tmp_path):
    spark = registered
    td = str(tmp_path / "t")
    for _ in range(3):  # replayed job: same marker no-ops
        (spark.createDataFrame([(1, "a")], "k bigint, v string")
         .write.format("versioned_table").option("path", td)
         .option("txn", "job-42").mode("append").save())
    assert current_version(td) == 1
    assert read_current(spark, td).count() == 1


def test_batch_schema_enforcement_and_evolution(registered, tmp_path):
    spark = registered
    td = str(tmp_path / "t")
    _w(_kv(spark, [(1, "a")]), td)
    with pytest.raises(Exception, match="[Ss]chema"):
        _w(spark.createDataFrame([(2, "b", 1.5)],
                                 "k bigint, v string, w double"), td)
    (spark.createDataFrame([(2, "b", 1.5)],
                           "k bigint, v string, w double")
     .write.format("versioned_table").option("path", td)
     .option("mergeSchema", "true").mode("append").save())
    got = sorted((r.k, r.v, r.w)
                 for r in read_current(spark, td).collect())
    assert got == [(1, "a", None), (2, "b", 1.5)]


def test_batch_stats_columns_recorded(registered, tmp_path):
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import _read_stats

    spark = registered
    td = str(tmp_path / "t")
    (spark.createDataFrame([(5, "a"), (9, "b")], "k bigint, v string")
     .write.format("versioned_table").option("path", td)
     .option("statsColumns", "k").mode("append").save())
    stats = _read_stats(td, 1)
    assert stats and all("k" in per for per in stats.values())
    lo = min(per["k"][0] for per in stats.values())
    hi = max(per["k"][1] for per in stats.values())
    assert (lo, hi) == (5, 9)


def test_write_refuses_constraint_tables(registered, tmp_path):
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.constraints import (
        set_table_constraints,
    )
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.expectations import (
        not_null,
    )

    spark = registered
    td = str(tmp_path / "t")
    append_version(_kv(spark, [(1, "a")]), td)
    set_table_constraints(spark, td, [not_null("k")])
    with pytest.raises(Exception, match="constraints"):
        _w(_kv(spark, [(2, "b")]), td)
    # nothing was published and no stage leaked
    assert current_version(td) == 1
    assert not [e for e in os.listdir(td) if e.startswith(".stage-")]


def test_empty_batch_commits_readable_version(registered, tmp_path):
    spark = registered
    td = str(tmp_path / "t")
    _w(_kv(spark, []), td)
    assert current_version(td) == 1
    cur = read_current(spark, td)
    assert cur.count() == 0 and cur.columns == ["k", "v"]


def test_stream_write_commits_per_batch_exactly_once(registered,
                                                     tmp_path):
    spark = registered
    td = str(tmp_path / "t")
    src, ck = str(tmp_path / "src"), str(tmp_path / "ck")
    schema = "k bigint, v string"
    (_kv(spark, [(1, "a")]).coalesce(1)
     .write.mode("overwrite").parquet(os.path.join(src, "b0")))

    def drain():
        q = (spark.readStream.schema(schema)
             .option("maxFilesPerTrigger", "1").parquet(src + "/*")
             .writeStream.format("versioned_table")
             .option("path", td).option("txnAppId", "ing")
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    drain()
    assert current_version(td) == 1
    assert read_current(spark, td).count() == 1
    drain()  # no new source files: no new version
    assert current_version(td) == 1
    (_kv(spark, [(2, "b")]).coalesce(1)
     .write.mode("overwrite").parquet(os.path.join(src, "b1")))
    drain()
    assert read_current(spark, td).count() == 2
    got = sorted((r.k, r.v) for r in read_current(spark, td).collect())
    assert got == [(1, "a"), (2, "b")]


def test_stream_write_requires_txn_app_id(registered, tmp_path):
    spark = registered
    td = str(tmp_path / "t")
    src = str(tmp_path / "src")
    (_kv(spark, [(1, "a")]).coalesce(1)
     .write.mode("overwrite").parquet(os.path.join(src, "b0")))
    with pytest.raises(Exception, match="txnAppId"):
        q = (spark.readStream.schema("k bigint, v string")
             .parquet(src + "/*")
             .writeStream.format("versioned_table")
             .option("path", td)
             .option("checkpointLocation", str(tmp_path / "ck"))
             .trigger(availableNow=True).start())
        q.awaitTermination()


def _batch(pairs):
    import pyarrow as pa

    return pa.record_batch(
        {"k": pa.array([k for k, _ in pairs], pa.int64()),
         "v": pa.array([v for _, v in pairs], pa.string())})


def test_batch_commit_publishes_only_messaged_parts(registered,
                                                    tmp_path):
    """A failed-then-retried / speculative task leaves a valid
    partial part in the shared stage dir; commit() must manifest
    exactly the messaged parts (r12 review pass 2)."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.sources.versioned_source import (
        _VersionedBatchWriter,
    )

    spark = registered
    td = str(tmp_path / "t")
    schema = _kv(spark, [(0, "x")]).schema
    w = _VersionedBatchWriter({"path": td}, schema, False)
    good = w.write(iter([_batch([(1, "a"), (2, "b")])]))
    w.write(iter([_batch([(1, "a")])]))  # failed attempt's leftover
    w.commit([good])
    got = sorted((r.k, r.v) for r in read_current(spark, td).collect())
    assert got == [(1, "a"), (2, "b")]


def test_batch_replay_detected_at_planning(registered, tmp_path):
    """A replayed job's writer no-ops from __init__ on: write()
    stages nothing and commit() publishes nothing."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.sources.versioned_source import (
        _VersionedBatchWriter,
    )

    spark = registered
    td = str(tmp_path / "t")
    schema = _kv(spark, [(0, "x")]).schema
    w = _VersionedBatchWriter({"path": td, "txn": "j1"}, schema, False)
    w.commit([w.write(iter([_batch([(1, "a")])]))])
    assert current_version(td) == 1
    w2 = _VersionedBatchWriter({"path": td, "txn": "j1"}, schema,
                               False)
    assert w2._noop
    msg = w2.write(iter([_batch([(9, "z")])]))
    assert msg.names == []
    w2.commit([msg])
    assert current_version(td) == 1
    assert not [e for e in os.listdir(td) if e.startswith(".stage-")]


def test_stream_complete_mode_commits_snapshots(registered, tmp_path):
    """COMPLETE output mode (engine passes truncate semantics) must
    snapshot per batch, not union stale and fresh aggregates."""
    spark = registered
    td = str(tmp_path / "t")
    src, ck = str(tmp_path / "src"), str(tmp_path / "ck")
    schema = "k bigint, v string"
    (_kv(spark, [(1, "a"), (2, "a")]).coalesce(1)
     .write.mode("overwrite").parquet(os.path.join(src, "b0")))

    def drain():
        q = (spark.readStream.schema(schema).parquet(src + "/*")
             .groupBy("v").count()
             .writeStream.outputMode("complete")
             .format("versioned_table")
             .option("path", td).option("txnAppId", "agg")
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    drain()
    assert [(r.v, r["count"]) for r in
            read_current(spark, td).collect()] == [("a", 2)]
    (_kv(spark, [(3, "a"), (4, "b")]).coalesce(1)
     .write.mode("overwrite").parquet(os.path.join(src, "b1")))
    drain()
    got = sorted((r.v, r["count"])
                 for r in read_current(spark, td).collect())
    assert got == [("a", 3), ("b", 1)]  # snapshot, no stale union
    # history is retained: the first snapshot is still time-travelable
    assert [(r.v, r["count"]) for r in
            read_version(spark, td, 1).collect()] == [("a", 2)]


def test_stream_replay_drains_past_new_constraints(registered,
                                                   tmp_path):
    """An already-committed batch must no-op on replay even if the
    table gained constraints since -- and a genuinely new batch is
    refused WITHOUT leaking parts in pending (r12 review pass 2)."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.constraints import (
        set_table_constraints,
    )
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.expectations import (
        not_null,
    )
    from esg_decarbonization_data_integration_and_data_pipline_spark.sources.versioned_source import (
        _VersionedStreamWriter,
    )

    spark = registered
    td = str(tmp_path / "t")
    schema = _kv(spark, [(0, "x")]).schema
    w = _VersionedStreamWriter({"path": td, "txnAppId": "s1"},
                               schema, False)
    w.commit([w.write(iter([_batch([(1, "a")])]))], 0)
    assert current_version(td) == 1
    set_table_constraints(spark, td, [not_null("k")])
    # replay of batch 0: drains silently, nothing new committed
    w.commit([w.write(iter([_batch([(1, "a")])]))], 0)
    assert current_version(td) == 1
    # a genuinely NEW batch is refused loudly and leaks no parts
    with pytest.raises(ValueError, match="constraints"):
        w.commit([w.write(iter([_batch([(2, "b")])]))], 1)
    assert not [e for e in os.listdir(w.pending)
                if not e.startswith(("_", "."))]


def test_stream_write_survives_pending_reap(registered, tmp_path):
    """vacuum's aged-stage sweep may remove the idle-empty pending
    dir under a live query; the next write must recreate it."""
    import shutil as sh

    from esg_decarbonization_data_integration_and_data_pipline_spark.sources.versioned_source import (
        _VersionedStreamWriter,
    )

    spark = registered
    td = str(tmp_path / "t")
    schema = _kv(spark, [(0, "x")]).schema
    w = _VersionedStreamWriter({"path": td, "txnAppId": "s2"},
                               schema, False)
    sh.rmtree(w.pending)
    w.commit([w.write(iter([_batch([(1, "a")])]))], 0)
    assert read_current(spark, td).count() == 1


def test_concurrent_batch_writers_both_commit(registered, tmp_path):
    """Two writers racing one table: the session-free commit loop
    renumbers the loser over the winner's version -- both batches
    land, neither is lost (the _manifest_commit rebase contract
    through the second stager)."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.sources.versioned_source import (
        _VersionedBatchWriter,
    )

    spark = registered
    td = str(tmp_path / "t")
    schema = _kv(spark, [(0, "x")]).schema
    w1 = _VersionedBatchWriter({"path": td}, schema, False)
    w2 = _VersionedBatchWriter({"path": td}, schema, False)
    m1 = w1.write(iter([_batch([(1, "a")])]))
    m2 = w2.write(iter([_batch([(2, "b")])]))  # staged before either commits
    w1.commit([m1])
    w2.commit([m2])
    assert committed_versions(td) == [1, 2]
    got = sorted((r.k, r.v) for r in read_current(spark, td).collect())
    assert got == [(1, "a"), (2, "b")]
    assert not [e for e in os.listdir(td) if e.startswith(".stage-")]


def test_roundtrip_write_then_read_faces(registered, tmp_path):
    """Full format() round trip: write face -> batch read face ->
    streaming tail -- no function API in the loop."""
    spark = registered
    td = str(tmp_path / "t")
    _w(_kv(spark, [(1, "a"), (2, "b")]), td)
    _w(_kv(spark, [(3, "c")]), td)
    got = sorted((r.k, r.v) for r in
                 spark.read.format("versioned_table")
                 .option("path", td).load().collect())
    assert got == [(1, "a"), (2, "b"), (3, "c")]
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (spark.readStream.format("versioned_table")
         .option("path", td).load()
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    assert spark.read.parquet(out).count() == 3
