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


def test_stateful_sessionize_late_event_moves_start_back(spark, tmp_path):
    """A late-but-within-watermark event with ts earlier than the open
    session's stored start must pull session_start back to min(ts) --
    matching the batch analog's min(ts) per session. Two micro-batches
    (maxFilesPerTrigger=1): batch 1 opens a session at minute 600;
    batch 2 delivers a late event at minute 590 (watermark after batch
    1 is 570) plus a gap-exceeding event at 660 that closes it."""
    import os

    import pandas as pd

    d = tmp_path / "late_events"
    d.mkdir()
    # anchored at a realistic 2023-era epoch: the adaptive reader
    # unit-sniffs integer ts by magnitude, and REAL event data is
    # never 36 seconds after 1970 -- toy epochs would (correctly)
    # classify as a smaller unit
    ns = lambda minutes: int((1_700_000_000 + minutes * 60)  # noqa: E731
                             * 1_000_000_000)

    def write(name, rows, mtime):
        pdf = pd.DataFrame(rows, columns=[
            "event_id", "ts", "user_id", "event_type", "value", "props"])
        pdf = pdf.astype({"event_id": "int64", "ts": "int64",
                          "user_id": "int64", "value": "float64"})
        p = str(d / name)
        pdf.to_parquet(p)
        os.utime(p, (mtime, mtime))

    write("a.parquet", [(1, ns(600), 1, "x", 1.0, "{}")], 1_000)
    write("b.parquet", [(2, ns(590), 1, "x", 0.5, "{}"),
                        (3, ns(660), 1, "x", 2.0, "{}")], 2_000)

    stream = read_event_stream(spark, str(d), max_files_per_trigger=1)
    run_to_memory(sessionize_stateful(stream), "late_sessions",
                  mode="append")
    got = [(r.user_id, r.session_start_us, r.session_end_us, r.n_events,
            r.total_value)
           for r in spark.table("late_sessions").collect()]
    assert got == [(1, ns(590) // 1000, ns(600) // 1000, 2, 1.5)]


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
