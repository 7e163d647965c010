"""Stream-stream interval join (streaming/events.attribute_clicks):
the streamed inner join over a multi-batch file source equals the
batch interval join row-for-row; the left-outer variant emits
never-clicked views (nulls) once the click watermark passes, and
every emitted row is verified against the batch analog.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window, functions as F

from esg_decarbonization_data_integration_and_data_pipline_spark.streaming.events import (
    attribute_clicks, read_event_stream, run_to_memory,
    split_event_stream,
)
from esg_decarbonization_data_integration_and_data_pipline_spark.tables import events_table


@pytest.fixture()
def chunked_stream_dir(spark, sf_dir, tmp_path) -> str:
    """Stage events as THREE time-ordered files so availableNow +
    maxFilesPerTrigger=1 yields three micro-batches with a rising
    watermark (in-order arrival: nothing is late-dropped, so the
    stream must equal the batch join exactly)."""
    ev = events_table(spark, sf_dir).orderBy("ts")
    n = ev.count()
    rows = ev.withColumn(
        "rn", F.row_number().over(Window.orderBy("ts")))
    d = tmp_path / "events_chunks"
    for i in range(3):
        (rows.filter((F.col("rn") > i * n // 3)
                     & (F.col("rn") <= (i + 1) * n // 3))
             .drop("rn").coalesce(1)
             .write.mode("overwrite").parquet(str(d / f"chunk{i}")))
    out = tmp_path / "events_stream"
    out.mkdir()
    import shutil
    for i in range(3):
        src = next((d / f"chunk{i}").glob("part-*.parquet"))
        shutil.copy(src, out / f"f{i}.parquet")
    return str(out)


def _batch_join(spark, sf_dir, join_type):
    ev = events_table(spark, sf_dir)
    views, clicks = split_event_stream(ev)
    return attribute_clicks(views, clicks, join_type=join_type)


def _key(rows):
    return sorted((r["view_id"], r["click_id"]) for r in rows)


def test_stream_stream_inner_join_matches_batch(spark, sf_dir,
                                                chunked_stream_dir):
    stream = read_event_stream(spark, chunked_stream_dir,
                               max_files_per_trigger=1)
    views, clicks = split_event_stream(stream)
    run_to_memory(attribute_clicks(views, clicks), "ss_inner",
                  mode="append")
    got = spark.table("ss_inner").collect()
    want = _batch_join(spark, sf_dir, "inner").collect()
    assert len(want) > 0
    assert _key(got) == _key(want)


def test_stream_stream_left_outer_emits_verified_nulls(
        spark, sf_dir, chunked_stream_dir):
    """Matched rows equal the inner join; every null-click row is a
    view with genuinely no click in its horizon (checked against the
    batch outer join); at least one null row was actually emitted
    (the watermark advanced far enough to prove outer semantics)."""
    stream = read_event_stream(spark, chunked_stream_dir,
                               max_files_per_trigger=1)
    views, clicks = split_event_stream(stream)
    run_to_memory(
        attribute_clicks(views, clicks, join_type="left_outer"),
        "ss_outer", mode="append")
    got = spark.table("ss_outer").collect()
    matched = [r for r in got if r["click_id"] is not None]
    nulls = [r for r in got if r["click_id"] is None]
    want_inner = _batch_join(spark, sf_dir, "inner").collect()
    assert _key(matched) == _key(want_inner)
    want_null_views = {r["view_id"] for r in
                       _batch_join(spark, sf_dir, "left_outer")
                       .filter("click_id is null").collect()}
    assert len(nulls) > 0
    assert {r["view_id"] for r in nulls} <= want_null_views
    # no view may appear both matched and null-emitted
    assert not ({r["view_id"] for r in nulls}
                & {r["view_id"] for r in matched})


def test_attribution_state_bound_documented(spark, sf_dir):
    """The batch analog of the join condition: every attributed pair
    sits inside [view_ts, view_ts + 10 minutes] for the same user --
    the invariant that makes stream state evictable."""
    out = _batch_join(spark, sf_dir, "inner")
    bad = out.filter(
        "click_ts < view_ts OR "
        "click_ts > view_ts + interval 10 minutes").count()
    assert bad == 0


def test_stream_static_broadcast_enrich_matches_batch(spark, sf_dir,
                                                      tmp_path):
    """Stream-static join (the dimension-enrich shape): a streaming
    events feed joined to a small static frame produces exactly the
    batch join -- no watermark needed, the static side is re-resolved
    per micro-batch."""
    import shutil

    from esg_decarbonization_data_integration_and_data_pipline_spark.streaming.events import (
        read_event_stream, run_to_memory,
    )

    d = tmp_path / "events_stream"
    d.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", d / "events.parquet")
    dim = spark.createDataFrame(
        [("click", 1.5), ("view", 1.0), ("error", 0.0)],
        "event_type string, weight double")
    stream = read_event_stream(spark, str(d))
    enriched = (stream.join(F.broadcast(dim), "event_type")
                      .select("event_id",
                              (F.col("value") * F.col("weight"))
                               .alias("weighted")))
    run_to_memory(enriched, "ss_static", mode="append")
    got = {r["event_id"]: r["weighted"] for r in
           spark.table("ss_static").collect()}
    batch = (events_table(spark, sf_dir).join(F.broadcast(dim),
                                              "event_type")
             .select("event_id", (F.col("value") * F.col("weight"))
                     .alias("weighted")))
    want = {r["event_id"]: r["weighted"] for r in batch.collect()}
    assert len(want) > 0
    assert got == want
