"""Streaming semantics pinned to the oracle-checked batch analogs."""

from __future__ import annotations

import shutil

import pytest

from esg_decarbonization_data_integration_and_data_pipline_spark.plans.queries import REGISTRY
from esg_decarbonization_data_integration_and_data_pipline_spark.streaming.events import (
    dedup_events, read_event_stream, run_to_memory, tumbling_value_agg,
)


@pytest.fixture()
def stream_dir(sf_dir, tmp_path) -> str:
    """File stream sources read directories; stage the fixture file."""
    d = tmp_path / "events_stream"
    d.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", d / "events.parquet")
    return str(d)


def test_tumbling_stream_matches_batch(spark, sf_dir, stream_dir):
    stream = read_event_stream(spark, stream_dir)
    run_to_memory(tumbling_value_agg(stream), "stream_agg", mode="complete")
    got = {(str(r.window_start), r.event_type): (r.n_events, r.total_value)
           for r in spark.table("stream_agg").collect()}
    batch = {(str(r.window_start), r.event_type): (r.n_events, r.total_value)
             for r in REGISTRY["events_tumbling_agg"].fn(spark, sf_dir).collect()}
    assert got == batch


def test_stream_dedup_keeps_all_distinct(spark, sf_dir, stream_dir):
    stream = read_event_stream(spark, stream_dir)
    run_to_memory(dedup_events(stream), "stream_dedup", mode="append")
    n = spark.table("stream_dedup").count()
    batch_n = REGISTRY["events_tumbling_agg"].fn(spark, sf_dir) \
        .agg({"n_events": "sum"}).collect()[0][0]
    assert n == batch_n  # event_ids are unique in the fixture


def test_stream_upsert_matches_batch_load_and_replays(spark, sf_dir,
                                                      stream_dir, tmp_path):
    """foreachBatch + replace_keys: the streamed table equals a batch
    replace_keys of the same data, and re-running the stream over the
    same source converges instead of duplicating (exactly-once via
    merge idempotency)."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.writers import (
        read_table, replace_keys,
    )
    from esg_decarbonization_data_integration_and_data_pipline_spark.streaming.events import stream_upsert

    out = str(tmp_path / "warehouse" / "events_live")
    stream = read_event_stream(spark, stream_dir).select(
        "event_id", "user_id", "event_type", "value")
    q = stream_upsert(stream, out, keys=["event_id"],
                      checkpoint=str(tmp_path / "ckpt1"))
    q.awaitTermination()
    got = read_table(spark, out)
    assert got.count() == got.select("event_id").distinct().count()

    batch_out = str(tmp_path / "warehouse" / "events_batch")
    batch = spark.read.parquet(f"{stream_dir}/events.parquet").select(
        "event_id", "user_id", "event_type", "value")
    replace_keys(batch, batch_out, keys=["event_id"])
    assert (sorted(map(tuple, got.collect()))
            == sorted(map(tuple, read_table(spark, batch_out).collect())))

    # replay from a FRESH checkpoint over the same source: converges
    before_rows = sorted(map(tuple, got.collect()))  # materialize before
    q2 = stream_upsert(stream, out, keys=["event_id"],  # the rewrite
                       checkpoint=str(tmp_path / "ckpt2"))
    q2.awaitTermination()
    again = read_table(spark, out)
    assert sorted(map(tuple, again.collect())) == before_rows


def test_stream_starts_on_empty_directory(spark, tmp_path):
    """Review fix: an empty (not-yet-populated) stream directory falls
    back to the default schema instead of failing schema inference."""
    d = tmp_path / "empty_events"
    d.mkdir()
    stream = read_event_stream(spark, str(d))
    assert stream.isStreaming
    run_to_memory(tumbling_value_agg(stream), "empty_agg", mode="complete")
    assert spark.table("empty_agg").count() == 0


def test_sliding_stream_matches_batch(spark, sf_dir, stream_dir):
    """The sliding (overlapping-window) stream equals the oracle-
    checked events_sliding_agg batch analog on a static read."""
    stream = read_event_stream(spark, stream_dir)
    run_to_memory(tumbling_value_agg(stream, slide="5 minutes"),
                  "stream_sliding", mode="complete")
    got = {(str(r.window_start), r.event_type): (r.n_events, r.total_value)
           for r in spark.table("stream_sliding").collect()}
    batch = {(str(r.window_start), r.event_type): (r.n_events, r.total_value)
             for r in REGISTRY["events_sliding_agg"].fn(spark, sf_dir).collect()}
    assert got == batch


def test_events_table_reads_both_physical_layouts(spark, sf_dir, tmp_path):
    """tables.events_table must load BOTH dataset generations: the
    r3+ native timestamp[us] layout (the real fixture) and the r1/r2
    int64-nanos layout (synthesized here) -- same rows either way."""
    import pandas as pd
    from esg_decarbonization_data_integration_and_data_pipline_spark.tables import events_table

    native = events_table(spark, sf_dir)
    assert native.schema["ts"].dataType.typeName() == "timestamp_ntz"

    pdf = pd.read_parquet(f"{sf_dir}/events.parquet")
    d = tmp_path / "nanos_events"
    d.mkdir()
    nanos = pdf.copy()
    # datetime64[us].astype(int64) would give MICROS; force ns first
    nanos["ts"] = (pd.to_datetime(nanos["ts"])
                   .astype("datetime64[ns]").astype("int64"))
    nanos.to_parquet(str(d / "events.parquet"))
    legacy = events_table(spark, str(d))
    assert legacy.schema["ts"].dataType.typeName() == "timestamp_ntz"

    a = {(r.event_id, str(r.ts), r.value) for r in native.collect()}
    b = {(r.event_id, str(r.ts), r.value) for r in legacy.collect()}
    assert a == b


def test_native_session_window_matches_lag_sessionize(spark, sf_dir):
    """sessionize_native (pure-JVM session_window) over a BATCH read
    equals the oracle-checked lag-based events_sessionize on
    (user, start, n_events, total_value); window ends are
    last-event + gap by definition, checked via the batch analog's
    session_end_us."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.streaming.events import (
        sessionize_native,
    )
    from esg_decarbonization_data_integration_and_data_pipline_spark.tables import events_table

    native = {(r["user_id"], r["session_start_us"]):
              (r["n_events"], r["total_value"], r["session_end_us"])
              for r in sessionize_native(
                  events_table(spark, sf_dir)).collect()}
    batch = {(r["user_id"], r["session_start_us"]):
             (r["n_events"], r["total_value"], r["session_end_us"])
             for r in REGISTRY["events_sessionize"]
             .fn(spark, sf_dir).collect()}
    assert len(native) == len(batch) > 0
    gap_us = 30 * 60 * 1_000_000
    for k, (n, tv, end) in batch.items():
        gn, gtv, gend = native[k]
        assert (gn, gtv) == (n, tv)
        assert gend == end + gap_us  # window end = last event + gap


def test_native_session_window_streams_final_sessions(spark, sf_dir,
                                                      stream_dir):
    """Streamed (append-mode) native sessions are a subset of the
    batch result -- only watermark-finalized sessions emit -- and
    every emitted session is value-correct."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.streaming.events import (
        sessionize_native,
    )
    from esg_decarbonization_data_integration_and_data_pipline_spark.tables import events_table

    stream = read_event_stream(spark, stream_dir)
    run_to_memory(sessionize_native(stream), "native_sess",
                  mode="append")
    got = {(r["user_id"], r["session_start_us"]):
           (r["n_events"], r["total_value"])
           for r in spark.table("native_sess").collect()}
    want = {(r["user_id"], r["session_start_us"]):
            (r["n_events"], r["total_value"])
            for r in sessionize_native(
                events_table(spark, sf_dir)).collect()}
    assert len(got) > 0
    for k, v in got.items():
        assert want[k] == v
