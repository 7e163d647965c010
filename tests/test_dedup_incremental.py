"""Incremental minhash dedup against a persisted signature store."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from conftest import sf_sibling

from esg_decarbonization_data_integration_and_data_pipline_spark.operators.dedup import (
    minhash_append_index, minhash_incremental_pairs, minhash_verified_pairs,
    minhash_write_index,
)


def _pairs(df):
    return {(frozenset((r.id_a, r.id_b)), r.jaccard) for r in df.collect()}


def test_incremental_equals_oneshot_on_new_pairs(spark, tmp_path):
    """Pairs touching the new batch from the incremental path match
    the one-shot verified pairs over the full corpus exactly."""
    docs = spark.read.parquet(sf_sibling("sf0.01") + "/documents.parquet")
    new = docs.filter(F.col("doc_id") % 4 == 0)
    old = docs.filter(F.col("doc_id") % 4 != 0)
    idx = str(tmp_path / "index")
    minhash_write_index(old, idx)

    incr = minhash_incremental_pairs(spark, new, idx, threshold=0.05)
    full = minhash_verified_pairs(docs, threshold=0.05)
    new_ids = {r.doc_id for r in new.select("doc_id").collect()}
    expected = {(p, j) for p, j in _pairs(full)
                if any(i in new_ids for i in p)}
    assert _pairs(incr) == expected
    # orientation: id_a is always from the new batch; 'against' is
    # consistent with id_b's membership
    for r in incr.collect():
        assert r.id_a in new_ids
        assert (r.id_b in new_ids) == (r.against == "batch")
    spark.catalog.clearCache()


def test_incremental_batch_pairs_toggle(spark, tmp_path):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "alpha beta gamma delta epsilon zeta eta"),   # ~dup of 1
         (4, "alpha beta gamma delta epsilon zeta theta"),  # ~dup of both
         (8, "totally different words with no overlap at all")],
        "doc_id bigint, text string")
    old = docs.filter("doc_id < 4")
    new = docs.filter("doc_id >= 4")
    idx = str(tmp_path / "index")
    minhash_write_index(old, idx)
    both = minhash_incremental_pairs(spark, new, idx, threshold=0.3)
    assert {r.against for r in both.collect()} == {"index"}
    no_batch = minhash_incremental_pairs(spark, new, idx, threshold=0.3,
                                         include_batch_pairs=False)
    assert _pairs(no_batch) <= _pairs(both)
    spark.catalog.clearCache()


def test_incremental_append_maintains_index(spark, tmp_path):
    """After appending batch 1's signatures, batch 2 finds its dups
    against batch 1 via the index -- no text rescan of either."""
    base = spark.createDataFrame(
        [(1, "one two three four five six seven")],
        "doc_id bigint, text string")
    b1 = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta")],
        "doc_id bigint, text string")
    b2 = spark.createDataFrame(
        [(20, "alpha beta gamma delta epsilon zeta eta")],
        "doc_id bigint, text string")
    idx = str(tmp_path / "index")
    minhash_write_index(base, idx)
    assert minhash_incremental_pairs(spark, b1, idx, 0.3).count() == 0
    minhash_append_index(b1, idx)
    got = minhash_incremental_pairs(spark, b2, idx, 0.3).collect()
    assert [(r.id_a, r.id_b, r.against) for r in got] == [(20, 10, "index")]
    assert len([f for f in os.listdir(idx) if f.endswith(".parquet")]) >= 2
    spark.catalog.clearCache()


def test_compact_index_collapses_replayed_appends(spark, tmp_path):
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.dedup import (
        minhash_compact_index,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")],
        "doc_id bigint, text string")
    idx = str(tmp_path / "index")
    minhash_write_index(docs, idx)
    # simulate two replayed appends of the same batch
    minhash_append_index(docs, idx)
    minhash_append_index(docs, idx)
    assert spark.read.parquet(idx).count() == 3
    assert minhash_compact_index(spark, idx) == 1
    # pair decisions unchanged after compaction
    newb = spark.createDataFrame(
        [(9, "alpha beta gamma delta epsilon zeta eta")],
        "doc_id bigint, text string")
    got = minhash_incremental_pairs(spark, newb, idx, 0.3).collect()
    assert [(r.id_a, r.id_b) for r in got] == [(9, 1)]
    spark.catalog.clearCache()
