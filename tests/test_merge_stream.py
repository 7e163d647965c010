"""Streaming CDC apply (streaming/merge_stream): one clause merge per
micro-batch, exactly-once under replay, CDC conflation, by-source
refusal."""

from __future__ import annotations

import os

import pytest

from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
    append_version, committed_versions, current_version, read_current,
)
from esg_decarbonization_data_integration_and_data_pipline_spark.streaming.merge_stream import (
    stream_merge_apply,
)

SCHEMA = "k bigint, v string, op string, lsn bigint"

CDC_CLAUSES = [
    {"when": "matched", "action": "delete", "condition": "s.op = 'D'"},
    {"when": "matched", "action": "update", "set": {"v": "s.v"}},
    {"when": "not_matched", "action": "insert",
     "condition": "s.op <> 'D'",
     "values": {"k": "s.k", "v": "s.v"}},
]


def _base(spark, tmp_path):
    td = str(tmp_path / "t")
    append_version(spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k bigint, v string")
        .coalesce(1), td, stats_columns=["k"])
    return td


def _write_batch(spark, src, rows, name):
    (spark.createDataFrame(rows, SCHEMA)
          .coalesce(1).write.mode("overwrite")
          .parquet(os.path.join(src, name)))


def _run(spark, src, td, ck, **kw):
    sdf = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", "1").parquet(src + "/*")
    q = stream_merge_apply(sdf, td, "k", CDC_CLAUSES, ck, **kw)
    q.awaitTermination()


def _state(spark, td):
    return {r.k: r.v for r in read_current(spark, td).collect()}


def test_cdc_upsert_delete_one_commit_per_batch(spark, tmp_path):
    td = _base(spark, tmp_path)
    src, ck = str(tmp_path / "src"), str(tmp_path / "ck")
    _write_batch(spark, src, [(1, "a2", "U", 1), (9, "new", "I", 2)],
                 "b0")
    _write_batch(spark, src, [(2, None, "D", 3), (9, "n2", "U", 4)],
                 "b1")
    _run(spark, src, td, ck)
    assert committed_versions(td) == [1, 2, 3]
    assert _state(spark, td) == {1: "a2", 3: "c", 9: "n2"}


def test_delete_op_on_unmatched_key_is_dropped(spark, tmp_path):
    td = _base(spark, tmp_path)
    src, ck = str(tmp_path / "src"), str(tmp_path / "ck")
    _write_batch(spark, src, [(42, None, "D", 1)], "b0")
    _run(spark, src, td, ck)
    assert 42 not in _state(spark, td)


def test_restart_replays_nothing_and_resumes(spark, tmp_path):
    td = _base(spark, tmp_path)
    src, ck = str(tmp_path / "src"), str(tmp_path / "ck")
    _write_batch(spark, src, [(1, "a2", "U", 1)], "b0")
    _run(spark, src, td, ck)
    v = current_version(td)
    _run(spark, src, td, ck)  # no new files
    assert current_version(td) == v
    _write_batch(spark, src, [(1, "a3", "U", 2)], "b1")
    _run(spark, src, td, ck)
    assert _state(spark, td)[1] == "a3"


def test_sink_level_replay_is_exactly_once(spark, tmp_path):
    """Crash between commit and checkpoint advance: the same
    (checkpoint, batch_id) applies once -- an accumulating update
    would otherwise double-count."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import merge_clauses

    td = str(tmp_path / "t")
    append_version(spark.createDataFrame(
        [(1, 10)], "k bigint, q bigint").coalesce(1), td)
    src = spark.createDataFrame([(1, 5)], "k bigint, q bigint")
    acc = [{"when": "matched", "action": "update",
            "set": {"q": "t.q + s.q"}}]
    merge_clauses(spark, td, src, "k", acc, txn="ckx:0")
    merge_clauses(spark, td, src, "k", acc, txn="ckx:0")
    assert committed_versions(td) == [1, 2]
    assert read_current(spark, td).collect()[0].q == 15


def test_cdc_conflation_keeps_latest_per_key(spark, tmp_path):
    td = _base(spark, tmp_path)
    src, ck = str(tmp_path / "src"), str(tmp_path / "ck")
    # one batch, three changes for key 1: without conflation the
    # cardinality contract would fail the batch
    _write_batch(spark, src,
                 [(1, "x1", "U", 1), (1, "x2", "U", 2),
                  (1, None, "D", 3)], "b0")
    _run(spark, src, td, ck, order_col="lsn")
    assert 1 not in _state(spark, td)  # the lsn=3 delete wins


def test_unconflated_duplicate_keys_fail_loudly(spark, tmp_path):
    from py4j.protocol import Py4JJavaError

    td = _base(spark, tmp_path)
    src, ck = str(tmp_path / "src"), str(tmp_path / "ck")
    _write_batch(spark, src, [(1, "x1", "U", 1), (1, "x2", "U", 2)],
                 "b0")
    with pytest.raises(Exception, match="de-duplicate|StreamingQuery"):
        _run(spark, src, td, ck)  # no order_col -> cardinality error
    assert _state(spark, td)[1] == "a"  # nothing committed


def test_by_source_clause_refused_before_start(spark, tmp_path):
    td = _base(spark, tmp_path)
    sdf = spark.readStream.schema(SCHEMA).parquet(
        str(tmp_path / "nope") + "/*")
    with pytest.raises(ValueError, match="full snapshot"):
        stream_merge_apply(
            sdf, td, "k",
            [{"when": "not_matched_by_source", "action": "delete"}],
            str(tmp_path / "ck"))
