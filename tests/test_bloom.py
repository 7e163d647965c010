"""Partitioned Bloom filter dedup (operators/bloom.py): the no-false-
negative guarantee (the property correctness rides on), measured FPP
sanity, byte-identical agreement with the plain anti-join, and the
bucket edge cases."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from esg_decarbonization_data_integration_and_data_pipline_spark.operators import bloom as B


def _docs(spark, texts, start_id=0):
    return spark.createDataFrame(
        [(start_id + i, t) for i, t in enumerate(texts)],
        "doc_id bigint, text string")


@pytest.fixture(scope="module")
def corpus(spark):
    return _docs(spark, [f"corpus document number {i} body" for i in range(300)])


@pytest.fixture(scope="module")
def bloom(corpus):
    return B.bloom_build(corpus, n_buckets=8).cache()


def test_no_false_negatives(spark, corpus, bloom):
    """Every corpus text must probe maybe_seen=True -- the guarantee
    that makes 'bloom miss => certainly new' sound."""
    probed = B.bloom_probe(corpus, bloom, n_buckets=8)
    assert probed.filter(~F.col("maybe_seen")).count() == 0


def test_false_positive_rate_sane(spark, corpus, bloom):
    """Novel texts should mostly probe False (expected FPP ~1% at 10
    bits/key; assert a loose <10% so the test is not flaky)."""
    novel = _docs(spark, [f"novel text {i} unseen" for i in range(500)],
                  start_id=10_000)
    fp = (B.bloom_probe(novel, bloom, n_buckets=8)
           .filter(F.col("maybe_seen")).count())
    assert fp / 500 < 0.10, f"FPP {fp/500:.3f}"


def test_new_docs_matches_plain_antijoin(spark, corpus, bloom):
    """bloom_new_docs is an accelerator, not a decider: its output
    must equal the plain md5 anti-join on a batch mixing novel rows,
    exact corpus dups, and intra-batch duplicate texts."""
    batch = _docs(spark,
                  [f"novel text {i} unseen" for i in range(50)]       # new
                  + [f"corpus document number {i} body" for i in range(40)]  # dups
                  + ["repeated novel line"] * 3,                      # batch-internal dups
                  start_id=20_000)
    got = sorted(r.doc_id for r in
                 B.bloom_new_docs(batch, corpus, bloom, n_buckets=8).collect())
    want = sorted(r.doc_id for r in
                  batch.join(corpus.select(F.md5("text").alias("__m")).distinct(),
                             F.md5(batch["text"]) == F.col("__m"),
                             "left_anti").collect())
    assert got == want
    # and the novel + batch-internal-dup rows are all present
    assert got == sorted(range(20_000, 20_050)) + [20_090, 20_091, 20_092]


def test_bucket_missing_from_bloom_probes_false(spark, corpus):
    """A bucket the corpus never touched yields no bloom row; batch
    rows landing there must probe certainly-new, not error."""
    tiny = _docs(spark, ["only one corpus doc"])
    bl = B.bloom_build(tiny, n_buckets=32)
    assert bl.count() == 1  # 1 key -> 1 bucket
    batch = _docs(spark, [f"spread across buckets {i}" for i in range(64)],
                  start_id=500)
    probed = B.bloom_probe(batch, bl, n_buckets=32)
    assert probed.filter(F.col("maybe_seen")).count() == 0


def test_duplicate_corpus_texts_are_one_key(spark):
    c = _docs(spark, ["same text"] * 100)
    bl = B.bloom_build(c, n_buckets=4)
    assert bl.agg(F.sum("n_keys")).first()[0] == 1


def test_empty_batch(spark, corpus, bloom):
    empty = _docs(spark, [])
    assert B.bloom_new_docs(empty, corpus, bloom, n_buckets=8).count() == 0


def test_mismatched_n_buckets_raises(spark, corpus, bloom):
    """Bucketing is part of the hash: probing a 8-bucket index as if
    it had 16 buckets would consult the wrong blooms and silently
    re-admit seen docs -- the recorded config makes it fail loudly."""
    batch = _docs(spark, ["whatever"], start_id=70_000)
    with pytest.raises(ValueError, match="n_buckets"):
        B.bloom_probe(batch, bloom, n_buckets=16)
    with pytest.raises(ValueError, match="n_buckets"):
        B.bloom_update(bloom, batch, n_buckets=16)


def test_update_keeps_no_false_negatives(spark, corpus, bloom):
    """After bloom_update, both the original corpus keys and the
    ingested batch keys must probe maybe_seen=True, and the result of
    bloom_new_docs against the grown corpus still equals the plain
    anti-join."""
    added = _docs(spark, [f"ingested doc {i}" for i in range(80)],
                  start_id=40_000)
    bl2 = B.bloom_update(bloom, added, n_buckets=8).cache()
    corpus2 = corpus.unionByName(added)
    probed = B.bloom_probe(corpus2, bl2, n_buckets=8)
    assert probed.filter(~F.col("maybe_seen")).count() == 0
    # untouched semantics: new_docs over the grown corpus == anti-join
    batch = _docs(spark, ["ingested doc 3", "corpus document number 7 body",
                          "still novel one", "still novel two"],
                  start_id=50_000)
    got = sorted(r.doc_id for r in
                 B.bloom_new_docs(batch, corpus2, bl2, n_buckets=8).collect())
    assert got == [50_002, 50_003]


def test_update_only_rewrites_touched_buckets(spark, corpus, bloom):
    one = _docs(spark, ["a single new doc"], start_id=60_000)
    before = {r.bucket: r.bits for r in bloom.collect()}
    after = {r.bucket: r.bits for r in
             B.bloom_update(bloom, one, n_buckets=8).collect()}
    changed = [b for b in after if after[b] != before.get(b)]
    assert len(changed) == 1  # exactly the one bucket the doc hashed to


def test_update_raises_on_saturation(spark):
    tiny = _docs(spark, ["seed doc"])
    bl = B.bloom_build(tiny, n_buckets=1)  # m_bits = 64 floor
    flood = _docs(spark, [f"flood {i}" for i in range(100)], start_id=100)
    with pytest.raises(Exception, match="rebuild"):
        B.bloom_update(bl, flood, n_buckets=1).collect()
