"""Streaming ingest with incremental near-dup detection against the
persisted signature store."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from esg_decarbonization_data_integration_and_data_pipline_spark.streaming.docs_dedup import (
    seed_index, stream_dedup_ingest,
)

SCHEMA = "doc_id bigint, text string"
D1 = [(1, "alpha beta gamma delta epsilon zeta"),
      (2, "completely unrelated words in this one here"),
      (3, "alpha beta gamma delta epsilon zeta eta")]     # ~dup of 1
D2 = [(10, "alpha beta gamma delta epsilon zeta theta"),  # ~dup of 1/3
      (11, "fresh new content with no overlap anywhere"),
      (12, "fresh new content with no overlap anywhere at all")]  # ~dup of 11


def _write_batch(spark, src, rows, name):
    (spark.createDataFrame(rows, SCHEMA)
          .coalesce(1).write.mode("overwrite")
          .parquet(os.path.join(src, name)))


def _run(spark, src, corpus, index, ckpt):
    sdf = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", "1").parquet(src + "/*")
    q = stream_dedup_ingest(sdf, corpus, index, ckpt, threshold=0.3)
    q.awaitTermination()


def test_stream_dedup_ingest(spark, tmp_path):
    src = str(tmp_path / "src")
    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    seed_index(spark, index)

    _write_batch(spark, src, D1, "b1")
    _run(spark, src, corpus, index, ckpt)
    got1 = {r.doc_id for r in spark.read.parquet(corpus).collect()}
    # batch-internal dup 3 dropped (min-id canonical)
    assert got1 == {1, 2}

    _write_batch(spark, src, D2, "b2")
    _run(spark, src, corpus, index, ckpt)
    got2 = {r.doc_id for r in spark.read.parquet(corpus).collect()}
    # 10 is a known dup vs the index (of 1); 12 drops within-batch
    assert got2 == {1, 2, 11}

    # audit table has both the index hit and the batch pairs
    dups = spark.read.parquet(corpus + "_dups")
    kinds = {(r.id_a, r.id_b, r.against) for r in dups.collect()}
    assert (3, 1, "batch") in kinds or (1, 3, "batch") in kinds
    assert any(a == 10 and ag == "index" for a, _, ag in kinds)

    # replay convergence: re-running with the same checkpoint and no
    # new files changes nothing
    _run(spark, src, corpus, index, ckpt)
    assert {r.doc_id for r in spark.read.parquet(corpus).collect()} == got2
    spark.catalog.clearCache()
