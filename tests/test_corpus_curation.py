"""End-to-end corpus curation over the fixture documents table."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import sf_sibling

from esg_decarbonization_data_integration_and_data_pipline_spark.pipelines.corpus_curation import curate

SF = sf_sibling("sf0.01")


def test_curate_end_to_end(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = curate(docs, min_quality=0.3, near_dup_threshold=0.5).cache()
    n = out.count()
    assert 0 < n <= docs.count()
    # every row carries the full curation verdict
    row = out.first()
    assert row.predicted_lang is not None and row.split in (
        "train", "eval", "test", "holdout")
    # cluster invariants: each cluster has exactly one canonical doc,
    # and it is the min id
    per_cluster = (out.groupBy("cluster_id")
                   .agg(F.sum(F.col("is_canonical").cast("int")).alias("k"),
                        F.min("doc_id").alias("lo")))
    assert per_cluster.filter("k <> 1").count() == 0
    canon = {r.cluster_id: r.doc_id
             for r in out.filter("is_canonical").collect()}
    lows = {r.cluster_id: r.lo for r in per_cluster.collect()}
    assert canon == lows
    # near-dups clustered: the fixture corpus has verified pairs, so
    # at least one multi-doc cluster exists and its members share a split
    multi = (out.groupBy("cluster_id").count().filter("count > 1"))
    assert multi.count() > 0
    out.unpersist()


def test_curate_quality_gate_filters(spark):
    docs = spark.createDataFrame(
        [(1, "the of and to in is a good long document " * 5),
         (2, "x")],                       # degenerate: fails the gate
        "doc_id bigint, text string")
    out = curate(docs, min_quality=0.3)
    assert [r.doc_id for r in out.collect()] == [1]


def test_curate_repetition_gate_filters(spark):
    varied = ("the of and to in is a good long document with many "
              "different words appearing once each time here")
    spammy = "the of and to in is spam " * 20   # one phrase repeated 20x
    docs = spark.createDataFrame(
        [(1, varied), (2, spammy)], "doc_id bigint, text string")
    # spammy passes quality (stopword-rich, long) but its duplicate-
    # bigram ratio is ~0.95 -- the repetition gate drops it
    out = curate(docs, min_quality=0.3, max_repetition=0.9)
    assert [r.doc_id for r in out.collect()] == [1]
    # gate disabled -> both survive
    both = curate(docs, min_quality=0.3, max_repetition=None)
    assert sorted(r.doc_id for r in both.collect()) == [1, 2]
