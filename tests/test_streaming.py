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
