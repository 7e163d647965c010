"""Streaming stateless-gate ingest (scrub + Gopher) vs its batch twin."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from esg_decarbonization_data_integration_and_data_pipline_spark.operators.text import gopher_rules
from esg_decarbonization_data_integration_and_data_pipline_spark.pipelines.corpus_curation import (
    _scrub_expr,
)
from esg_decarbonization_data_integration_and_data_pipline_spark.streaming.docs_gate import (
    stream_gate_ingest,
)

SCHEMA = "doc_id bigint, text string"
GOOD = ("the of and to in is a good long document with many different "
        "words appearing here to clear the floor easily " * 2)
D1 = [(1, GOOD),
      (2, "tiny the a doc"),                          # fails word floor
      (3, "contact me at alice@example.com " + GOOD)]  # scrubbed, passes
D2 = [(10, GOOD + " second wave"),
      (11, "the a of " + "#### " * 40)]               # symbol-heavy


def _write_batch(spark, src, rows, name):
    (spark.createDataFrame(rows, SCHEMA)
          .coalesce(1).write.mode("overwrite")
          .parquet(os.path.join(src, name)))


def _run(spark, src, corpus, ckpt):
    sdf = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", "1").parquet(src + "/*")
    q = stream_gate_ingest(sdf, corpus, ckpt, gopher={"min_words": 25})
    q.awaitTermination()


def test_stream_gate_matches_batch_twin(spark, tmp_path):
    src = str(tmp_path / "src")
    corpus = str(tmp_path / "corpus")
    os.makedirs(src)

    _write_batch(spark, src, D1, "b1")
    _run(spark, src, corpus, str(tmp_path / "ck1"))
    _write_batch(spark, src, D2, "b2")
    _run(spark, src, corpus, str(tmp_path / "ck2"))

    got = spark.read.parquet(corpus)
    assert {r.doc_id for r in got.collect()} == {1, 3, 10}
    # the stream applied the SAME scrub the batch pipeline would
    scrubbed = {r.doc_id: r.text for r in got.collect()}
    assert "alice@example.com" not in scrubbed[3]

    # batch twin: identical survivors and identical scrubbed text
    batch = (spark.createDataFrame(D1 + D2, SCHEMA)
                  .withColumn("text", _scrub_expr()))
    twin = (gopher_rules(batch, min_words=25)
            .filter(F.col("gopher_pass") == 1)
            .select("doc_id", "text"))
    assert sorted(map(tuple, twin.collect())) == sorted(
        (r.doc_id, r.text) for r in got.collect())

    # rejects carry the per-rule flags
    rej = {r.doc_id: r for r in
           spark.read.parquet(corpus + "_rejects").collect()}
    assert set(rej) == {2, 11}
    assert rej[2]["r_words"] == 0 and rej[11]["r_symbol"] == 0

    # replaying the whole source into the same corpus CONVERGES
    _run(spark, src, corpus, str(tmp_path / "ck3"))
    again = spark.read.parquet(corpus)
    assert again.count() == 3


def test_stream_gate_scrub_only(spark, tmp_path):
    src = str(tmp_path / "src")
    corpus = str(tmp_path / "corpus2")
    os.makedirs(src)
    _write_batch(spark, src, D1, "b1")
    sdf = spark.readStream.schema(SCHEMA).parquet(src + "/*")
    q = stream_gate_ingest(sdf, corpus, str(tmp_path / "ck"),
                           gopher=None)   # gates off: scrub-only passthrough
    q.awaitTermination()
    got = spark.read.parquet(corpus)
    assert got.count() == 3
    assert not os.path.exists(corpus + "_rejects")
