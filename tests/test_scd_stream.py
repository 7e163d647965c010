"""Streaming SCD2 maintenance (streaming/scd_stream): one fold per
micro-batch, exactly-once under replay, CDC conflation, event-time
effectives."""

from __future__ import annotations

import os

from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
    committed_versions,
    current_version,
    read_current,
)
from esg_decarbonization_data_integration_and_data_pipline_spark.streaming.scd_stream import (
    stream_scd2_apply,
)

SCHEMA = "k bigint, seg string, ts bigint"


def _write_batch(spark, src, rows, name):
    (spark.createDataFrame(rows, SCHEMA)
          .coalesce(1).write.mode("overwrite")
          .parquet(os.path.join(src, name)))


def _run(spark, src, td, ck, **kw):
    sdf = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", "1").parquet(src + "/*")
    q = stream_scd2_apply(sdf, td, "k", ["seg"], ck, **kw)
    q.awaitTermination()


def _hist(spark, td):
    return sorted(
        ((r.k, r.seg, r.valid_from, r.valid_to, r.is_current)
         for r in read_current(spark, td).collect()),
        key=lambda t: (t[0], t[2]))


def test_one_fold_per_batch_with_batchid_effectives(spark, tmp_path):
    src, td, ck = (str(tmp_path / "src"), str(tmp_path / "t"),
                   str(tmp_path / "ck"))
    _write_batch(spark, src, [(1, "A", 0), (2, "B", 0)], "b0")
    _write_batch(spark, src, [(1, "A2", 0)], "b1")
    _run(spark, src, td, ck, order_col="ts")
    assert committed_versions(td) == [1, 2]
    assert _hist(spark, td) == [
        (1, "A", 0, 1, False),
        (1, "A2", 1, None, True),
        (2, "B", 0, None, True),
    ]


def test_restart_replays_nothing_and_resumes(spark, tmp_path):
    src, td, ck = (str(tmp_path / "src"), str(tmp_path / "t"),
                   str(tmp_path / "ck"))
    _write_batch(spark, src, [(1, "A", 0)], "b0")
    _run(spark, src, td, ck, order_col="ts")
    v = current_version(td)
    _run(spark, src, td, ck, order_col="ts")  # no new files
    assert current_version(td) == v
    _write_batch(spark, src, [(1, "Z", 0)], "b1")
    _run(spark, src, td, ck, order_col="ts")
    assert [r.seg for r in read_current(spark, td)
            .filter("is_current").collect()] == ["Z"]


def test_sink_level_replay_is_exactly_once(spark, tmp_path):
    """Crash between commit and checkpoint advance: the same
    (checkpoint, batch_id) folds once -- a double fold would CLOSE
    the row it just opened."""
    import hashlib

    from esg_decarbonization_data_integration_and_data_pipline_spark.io.scd import scd2_apply

    td = str(tmp_path / "t")
    ck = hashlib.md5(b"ck").hexdigest()[:12]
    batch = spark.createDataFrame([(1, "A", 1.0)],
                                  "k bigint, seg string, bal double")
    scd2_apply(spark, td, batch, "k", ["seg"], 0, txn=f"{ck}:0")
    scd2_apply(spark, td, batch, "k", ["seg"], 0, txn=f"{ck}:0")
    assert committed_versions(td) == [1]
    rows = read_current(spark, td).collect()
    assert len(rows) == 1 and rows[0].is_current


def test_cdc_conflation_keeps_latest_per_key(spark, tmp_path):
    src, td, ck = (str(tmp_path / "src"), str(tmp_path / "t"),
                   str(tmp_path / "ck"))
    _write_batch(spark, src,
                 [(1, "old", 10), (1, "new", 20), (2, "B", 5)], "b0")
    _run(spark, src, td, ck, order_col="ts")
    cur = {r.k: r.seg for r in read_current(spark, td)
           .filter("is_current").collect()}
    assert cur == {1: "new", 2: "B"}
    # the conflation column never lands in the dimension
    assert "ts" not in read_current(spark, td).columns


def test_event_time_effectives(spark, tmp_path):
    src, td, ck = (str(tmp_path / "src"), str(tmp_path / "t"),
                   str(tmp_path / "ck"))
    _write_batch(spark, src, [(1, "A", 100)], "b0")
    _write_batch(spark, src, [(1, "B", 250)], "b1")
    _run(spark, src, td, ck, effective_col="ts", order_col="ts")
    assert _hist(spark, td) == [
        (1, "A", 100, 250, False),
        (1, "B", 250, None, True),
    ]
