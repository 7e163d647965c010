"""Unit tests for the operator library on tiny in-memory fixtures,
mirroring the reference's mock-driven test shape
(reference: tests/jobs_source_to_raw_test.py:12-55)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from esg_decarbonization_data_integration_and_data_pipline_spark.operators.joins import (
    anti_join, asof_join, coalescing_outer_join, interval_join, semi_join,
)
from esg_decarbonization_data_integration_and_data_pipline_spark.operators.rollup import rollup_all
from esg_decarbonization_data_integration_and_data_pipline_spark.operators.windows import (
    latest_version, share_of_total, top1_per_group, ytm_cumsum,
)
from esg_decarbonization_data_integration_and_data_pipline_spark.operators.reshape import melt, pivot_wide


def test_ytm_cumsum(spark):
    df = spark.createDataFrame(
        [("WZS", 2023, 1, 10.0), ("WZS", 2023, 2, 5.0), ("WZS", 2024, 1, 7.0),
         ("WKS", 2023, 1, 1.0)],
        "site string, year int, month int, amount double")
    out = {(r.site, r.year, r.month): r.ytm_amount
           for r in ytm_cumsum(df, ["site", "year"], "month", "amount").collect()}
    assert out[("WZS", 2023, 1)] == 10.0
    assert out[("WZS", 2023, 2)] == 15.0
    assert out[("WZS", 2024, 1)] == 7.0  # resets per year
    assert out[("WKS", 2023, 1)] == 1.0


def test_rollup_all_labels(spark):
    df = spark.createDataFrame(
        [("BO1", "WZS", 1.0), ("BO1", "WKS", 2.0), ("BO2", "WZS", 4.0)],
        "bo string, site string, amount double")
    out = rollup_all(df, ["bo", "site"], [], [F.sum("amount").alias("amount")])
    rows = {(r.bo, r.site): r.amount for r in out.collect()}
    assert rows[("BO1", "WZS")] == 1.0
    assert rows[("BO1", "ALL")] == 3.0
    assert rows[("BO2", "ALL")] == 4.0
    assert rows[("ALL", "ALL")] == 7.0
    # detail + per-bo ALL + grand total
    assert len(rows) == 3 + 2 + 1


def test_rollup_all_fixed_keys(spark):
    df = spark.createDataFrame(
        [("2023-01-01", "WZS", 1.0), ("2023-01-01", "WKS", 2.0),
         ("2023-02-01", "WZS", 5.0)],
        "period_start string, site string, amount double")
    out = rollup_all(df, ["site"], ["period_start"],
                     [F.sum("amount").alias("amount")])
    rows = {(r.period_start, r.site): r.amount for r in out.collect()}
    assert rows[("2023-01-01", "ALL")] == 3.0
    assert rows[("2023-02-01", "ALL")] == 5.0
    assert ("ALL",) not in {k[1:] for k in rows if k[0] is None}  # no rolled-up period rows


def test_asof_join_picks_nearest_leq(spark):
    left = spark.createDataFrame(
        [("a", 10), ("a", 5), ("b", 10)], "k string, t int")
    right = spark.createDataFrame(
        [("a", 1, "old"), ("a", 7, "mid"), ("a", 11, "future"), ("b", 99, "never")],
        "k string, t2 int, tag string")
    out = {(r.k, r.t): r.tag for r in
           asof_join(left, right, ["k"], "t", "t2").collect()}
    assert out[("a", 10)] == "mid"
    assert out[("a", 5)] == "old"
    assert out[("b", 10)] is None  # no match kept as null


def test_interval_join_bands(spark):
    pts = spark.createDataFrame([(1,), (15,), (40,)], "x int")
    bands = spark.createDataFrame(
        [("lo", 0, 9), ("mid", 10, 29), ("hi", 30, 50)], "band string, lo int, hi int")
    out = {r.x: r.band for r in
           interval_join(pts, bands, [], "x", "lo", "hi").collect()}
    assert out == {1: "lo", 15: "mid", 40: "hi"}


def test_coalescing_outer_join_priority(spark):
    left = spark.createDataFrame([("a", 1.0), ("b", None)], "k string, v double")
    right = spark.createDataFrame([("b", 9.0), ("c", 3.0)], "k string, v double")
    out = {r.k: r.v for r in
           coalescing_outer_join(left, right, ["k"], ["v"]).collect()}
    assert out == {"a": 1.0, "b": 9.0, "c": 3.0}


def test_anti_semi(spark):
    left = spark.createDataFrame([("a",), ("b",), ("c",)], "k string")
    right = spark.createDataFrame([("b",)], "k string")
    assert {r.k for r in anti_join(left, right, ["k"]).collect()} == {"a", "c"}
    assert {r.k for r in semi_join(left, right, ["k"]).collect()} == {"b"}


def test_latest_version_keeps_ties(spark):
    df = spark.createDataFrame(
        [("s1", 1, "x"), ("s1", 2, "y"), ("s1", 2, "z"), ("s2", 5, "w")],
        "site string, version int, payload string")
    out = latest_version(df, ["site"], [F.col("version").desc()])
    got = {(r.site, r.payload) for r in out.collect()}
    assert got == {("s1", "y"), ("s1", "z"), ("s2", "w")}


def test_top1_and_share(spark):
    df = spark.createDataFrame(
        [("n1", 1, 10.0), ("n1", 2, 30.0), ("n2", 3, 5.0)],
        "g string, id int, v double")
    top = top1_per_group(df, ["g"], [F.col("v").desc(), F.col("id")])
    assert {(r.g, r.id) for r in top.collect()} == {("n1", 2), ("n2", 3)}
    shares = {r.id: r.ratio for r in share_of_total(df, ["g"], "v").collect()}
    assert shares[1] == 0.25 and shares[2] == 0.75 and shares[3] == 1.0


def test_melt_pivot_roundtrip(spark):
    wide = spark.createDataFrame(
        [(2023, 1.0, 2.0), (2024, 3.0, 4.0)], "year int, jan double, feb double")
    long = melt(wide, ["year"], ["jan", "feb"], "month", "amount")
    assert long.count() == 4
    back = pivot_wide(long, ["year"], "month", F.first("amount"), ["jan", "feb"])
    rows = {r.year: (r.jan, r.feb) for r in back.collect()}
    assert rows == {2023: (1.0, 2.0), 2024: (3.0, 4.0)}


def test_multimodal_resize_and_frame_sampling(spark):
    """Resize runs Arrow-batched with deterministic stub sizes;
    frame sampling is pure JVM (posexplode + binary substring) with
    in-bounds offsets and one row per surviving frame."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.multimodal import (
        resize_payloads, sample_frames, with_binary_payload,
    )

    docs = spark.createDataFrame(
        [(1, "a" * 300), (2, "b" * 40)], "doc_id bigint, text string")
    b = with_binary_payload(docs)

    resized = {r.doc_id: r for r in resize_payloads(b, 64, 64).collect()}
    assert resized[1].payload_bytes == 64    # capped by target pixels/64
    assert resized[2].payload_bytes == 40    # capped by payload
    assert resized[1].width == 64 and resized[1].height == 64

    frames = sample_frames(b, n_frames=4, frame_bytes=8)
    rows = frames.filter("doc_id = 1").collect()
    assert [r.frame_idx for r in rows] == [0, 1, 2, 3]
    assert all(r.frame_offset == r.frame_idx * 75 for r in rows)
    assert all(len(r.frame) == 8 for r in rows)
    # no Python in the frame path: no ArrowEvalPython / eval node
    plan = frames._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "EvalPython" not in plan


def test_repetition_stats_edges(spark):
    """Duplicate-bigram ratio: exact counts on a crafted doc, zero
    counts + NULL ratios for token-free docs, null propagation."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.text import (
        repetition_stats,
    )
    df = spark.createDataFrame(
        [(0, "a b a b a"),      # bigrams: ab, ba, ab, ba -> 4 total, 2 distinct
         (1, "one"),            # no bigrams
         (2, None)],
        "doc_id long, text string")
    got = {r.doc_id: r for r in repetition_stats(df).collect()}
    assert got[0].total_bigrams == 4 and got[0].distinct_bigrams == 2
    assert got[0].repetition_ratio == 0.5
    assert got[0].top_gram_share == 0.5
    assert got[1].total_bigrams == 0 and got[1].repetition_ratio is None
    assert got[2].total_bigrams is None and got[2].repetition_ratio is None


def test_chunk_documents_boundaries(spark):
    """Chunk windows: step = chunk - overlap, short tail kept, short
    docs give one chunk, token-free/null docs give none, original
    case preserved."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.text import (
        chunk_documents,
    )
    import pytest as _pytest

    toks = " ".join(f"T{i}" for i in range(10))      # 10 tokens, capital T
    docs = spark.createDataFrame(
        [(0, toks), (1, "a b"), (2, "   "), (3, None)],
        "doc_id long, text string")
    out = chunk_documents(docs, chunk_tokens=4, overlap=1)  # step 3
    got = {(r.doc_id, r.chunk_idx): (r.chunk_text, r.n_tokens)
           for r in out.collect()}
    # ceil((10-1)/3) = 3 chunks: [0:4], [3:7], [6:10]
    assert got[(0, 0)] == ("T0 T1 T2 T3", 4)
    assert got[(0, 1)] == ("T3 T4 T5 T6", 4)
    assert got[(0, 2)] == ("T6 T7 T8 T9", 4)
    assert got[(1, 0)] == ("a b", 2)                # short doc: one chunk
    assert {k[0] for k in got} == {0, 1}            # 2 and 3 yield nothing
    with _pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, chunk_tokens=4, overlap=4)
