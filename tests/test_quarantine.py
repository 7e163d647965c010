"""Row-level expectation routing (operators/expectations.
tag_violations / quarantine_split) and the exactly-once streaming
quarantine sink (streaming/quarantine.stream_quarantine).
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from esg_decarbonization_data_integration_and_data_pipline_spark.operators import expectations as E


@pytest.fixture()
def frame(spark):
    return spark.createDataFrame(
        [(1, "a", 5.0), (2, "z", -1.0), (3, None, 200.0), (4, "b", None)],
        "id bigint, cat string, val double")


def _checks():
    return [E.not_null("cat"), E.in_set("cat", ["a", "b"]),
            E.in_range("val", 0, 100)]


def test_tag_violations_labels_in_declaration_order(spark, frame):
    got = {r["id"]: list(r["failed_checks"]) for r in
           E.tag_violations(frame, _checks()).collect()}
    assert got[1] == []
    assert got[2] == ["in_set:cat", "in_range:val"]
    assert got[3] == ["not_null:cat", "in_range:val"]
    assert got[4] == []  # null val: in_range skips nulls by contract


def test_tag_violations_is_narrow_zero_shuffle(spark, frame):
    plan = (E.tag_violations(frame, _checks())
             ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


def test_tag_violations_rejects_grouped_kinds_and_dups(spark, frame):
    with pytest.raises(ValueError, match="row-level"):
        E.tag_violations(frame, [E.unique("id")])
    with pytest.raises(ValueError):
        E.tag_violations(frame, [])
    with pytest.raises(ValueError, match="duplicate"):
        E.tag_violations(frame, [E.not_null("cat"), E.not_null("cat")])


def test_quarantine_split_partitions_rows(spark, frame):
    clean, bad = E.quarantine_split(frame, _checks())
    assert sorted(r["id"] for r in clean.collect()) == [1, 4]
    assert clean.columns == frame.columns  # tags dropped on clean
    got_bad = {r["id"] for r in bad.collect()}
    assert got_bad == {2, 3}
    assert "failed_checks" in bad.columns
    assert clean.count() + bad.count() == frame.count()


def test_stream_quarantine_matches_batch_and_replays(spark, sf_dir,
                                                     tmp_path):
    """The streamed split equals quarantine_split on a batch read of
    the same source, and a crash-replay (same checkpoint identity,
    fresh checkpoint state) converges via the shared txn marker
    instead of double-appending."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import read_current
    from esg_decarbonization_data_integration_and_data_pipline_spark.streaming.events import (
        read_event_stream,
    )
    from esg_decarbonization_data_integration_and_data_pipline_spark.streaming.quarantine import (
        stream_quarantine,
    )
    from esg_decarbonization_data_integration_and_data_pipline_spark.tables import events_table

    src = tmp_path / "events_stream"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "events.parquet")
    checks = [E.not_null("event_type"),
              E.in_range("value", 0, 15),
              E.in_set("event_type",
                       ["click", "view", "purchase", "error",
                        "signup"])]
    cols = ["event_id", "user_id", "event_type", "value"]
    table_dir = str(tmp_path / "clean")
    qdir = str(tmp_path / "quarantine")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = read_event_stream(spark, str(src)).select(*cols)
        q = stream_quarantine(stream, checks, table_dir, qdir, ckpt)
        q.awaitTermination()

    run()
    batch = events_table(spark, sf_dir).select(*cols)
    want_clean, want_bad = E.quarantine_split(batch, checks)
    got_clean = read_current(spark, table_dir)
    got_bad = read_current(spark, qdir)
    assert got_clean.count() == want_clean.count()
    assert got_bad.count() == want_bad.count() > 0
    assert (got_clean.filter("value < 0 or value > 15").count() == 0)
    # every quarantined row carries at least one tag that's real
    bad_tags = got_bad.select(
        F.explode("failed_checks").alias("t")).distinct().collect()
    assert {r["t"] for r in bad_tags} <= {c.label for c in checks}
    # crash-replay: wipe checkpoint STATE but keep the tables; batch
    # ids restart at 0 with the same checkpoint identity, so the txn
    # markers refuse the duplicate appends on both sinks
    shutil.rmtree(ckpt)
    run()
    assert read_current(spark, table_dir).count() == want_clean.count()
    assert read_current(spark, qdir).count() == want_bad.count()
