"""Custom stateful streaming operator pinned to the batch analog:
sessions the stream CLOSES within the data must exactly equal the
batch sessionization minus each user's final (still-open) session."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from esg_decarbonization_data_integration_and_data_pipline_spark.plans.queries import REGISTRY
from esg_decarbonization_data_integration_and_data_pipline_spark.streaming.events import (
    read_event_stream, run_to_memory, sessionize_stateful,
)


@pytest.fixture()
def stream_dir(sf_dir, tmp_path) -> str:
    d = tmp_path / "events_stream"
    d.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", d / "events.parquet")
    return str(d)


def test_stateful_sessionize_matches_batch_closed_sessions(
        spark, sf_dir, stream_dir):
    stream = read_event_stream(spark, stream_dir)
    run_to_memory(sessionize_stateful(stream), "stream_sessions",
                  mode="append")
    got = {(r.user_id, r.session_start_us, r.session_end_us,
            r.n_events, round(r.total_value, 4))
           for r in spark.table("stream_sessions").collect()}

    batch = REGISTRY["events_sessionize"].fn(spark, sf_dir)
    # drop each user's last session -- it is still open in the stream
    from pyspark.sql import Window
    w = Window.partitionBy("user_id")
    closed = (batch
              .withColumn("__max", F.max("session_id").over(w))
              .filter(F.col("session_id") < F.col("__max")))
    want = {(r.user_id, r.session_start_us, r.session_end_us,
             r.n_events, round(r.total_value, 4))
            for r in closed.collect()}
    assert got == want
    assert len(got) > 0  # the fixture actually closes sessions
