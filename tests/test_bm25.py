"""BM25 ranked retrieval (operators/text.bm25_topk): hand-computed
scores on a tiny corpus, self-retrieval over the fixtures, N/avgdl
semantics for unmatchable docs, distinct-query-term counting, and
the scale plan shape (query-vocab broadcast pre-filter, no
sort-merge joins anywhere).
"""

from __future__ import annotations

import math

import pytest

from esg_decarbonization_data_integration_and_data_pipline_spark.operators.text import bm25_topk


def _corpus(spark):
    return spark.createDataFrame(
        [(1, "apple banana apple"), (2, "banana cherry"),
         (3, "durian"), (4, None)],
        "doc_id bigint, text string")


def _queries(spark, rows):
    return spark.createDataFrame(rows, "query_id bigint, text string")


def test_bm25_hand_computed(spark):
    """Scores equal the Lucene-idf BM25 formula computed by hand;
    N=4 and avgdl=1.5 include the null-text doc."""
    out = bm25_topk(_corpus(spark),
                    _queries(spark, [(10, "apple banana apple")]),
                    k=5)
    rows = {r["doc_id"]: r for r in out.collect()}
    idf_a = math.log(1 + (4 - 1 + 0.5) / (1 + 0.5))
    idf_b = math.log(1 + (4 - 2 + 0.5) / (2 + 0.5))

    def ts(idf, tf, dl):
        return idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / 1.5))

    assert set(rows) == {1, 2}  # durian / null doc never match
    assert rows[1]["score"] == pytest.approx(
        round(ts(idf_a, 2, 3) + ts(idf_b, 1, 3), 6), abs=2e-6)
    assert rows[2]["score"] == pytest.approx(
        round(ts(idf_b, 1, 2), 6), abs=2e-6)
    assert rows[1]["n_terms"] == 2 and rows[2]["n_terms"] == 1
    assert rows[1]["rank"] == 1 and rows[2]["rank"] == 2


def test_bm25_duplicate_query_terms_count_once(spark):
    """BM25 sums over DISTINCT query terms: a repeated term must not
    double its contribution."""
    once = bm25_topk(_corpus(spark), _queries(spark, [(1, "banana")]),
                     k=5).collect()
    twice = bm25_topk(_corpus(spark),
                      _queries(spark, [(1, "banana banana")]),
                      k=5).collect()
    key = lambda rows: sorted((r["doc_id"], r["score"], r["rank"])
                              for r in rows)
    assert key(once) == key(twice)


def test_bm25_empty_query_and_no_match_absent(spark):
    out = bm25_topk(
        _corpus(spark),
        _queries(spark, [(1, "   "), (2, None), (3, "zebra")]),
        k=5)
    assert out.count() == 0


def test_bm25_k_cut_and_tiebreak(spark):
    """Equal rounded scores break on doc_id; k truncates the list."""
    corpus = spark.createDataFrame(
        [(i, "apple") for i in range(6)], "doc_id bigint, text string")
    out = bm25_topk(corpus, _queries(spark, [(1, "apple")]), k=3)
    got = [(r["doc_id"], r["rank"]) for r in
           out.orderBy("rank").collect()]
    assert got == [(0, 1), (1, 2), (2, 3)]


def test_bm25_self_retrieval_on_fixtures(spark, sf_dir):
    """A document used verbatim as the query matches ALL of its own
    distinct terms (n_terms == its distinct token count).  Rank 1 is
    NOT guaranteed -- the fixture corpus draws from a tiny shared
    vocabulary, so a longer doc with higher query-term tf can
    legitimately outrank the source (observed on the original
    %83==7 slice: doc 154 over query 90 at sf0.01)."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.tables import table
    from pyspark.sql import functions as F

    docs = table(spark, sf_dir, "documents")
    qs = (docs.filter(F.col("doc_id") % 83 == 0)
              .select(F.col("doc_id").alias("query_id"), "text"))
    n_docs = docs.count()
    hits = bm25_topk(docs, qs, k=n_docs)
    self_terms = {r["query_id"]: r["n_terms"] for r in
                  hits.filter("query_id = doc_id").collect()}
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.text import tokens
    want = {r["query_id"]: r["n"] for r in
            qs.select("query_id",
                      F.size(F.array_distinct(tokens("text")))
                       .alias("n")).collect()}
    assert len(want) > 0
    assert self_terms == want


def test_bm25_plan_broadcasts_query_side_everywhere(spark, sf_dir):
    """Scale shape: the query-token set, idf frame, stats row and
    (query, token) map all reach the corpus as BROADCAST joins -- no
    sort-merge join anywhere.  Since r15 the postings-sized tf frame
    and the query-token map are localCheckpoint-materialized (each
    was reused by two subtrees, re-running the corpus tokenize
    without truncation), so the FINAL plan reads them as ExistingRDD
    scans and carries the idf/q broadcast joins; the qtok broadcast
    pre-filter and the corpus-grain (doc_id, token) exchange live in
    the tf materialization job, asserted on tf's own plan here."""
    from pyspark.sql import functions as F

    from esg_decarbonization_data_integration_and_data_pipline_spark.plans.queries import REGISTRY
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.text import (
        tokens,
    )
    from esg_decarbonization_data_integration_and_data_pipline_spark.tables import table

    df = REGISTRY["bm25_retrieval_docs"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # idf -> term and q -> hits stay broadcast in the final plan;
    # the materialized tf/q frames surface as in-memory RDD scans
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    assert plan.count("Scan ExistingRDD") >= 2
    # the corpus-grain shape lives in the tf build: broadcast token
    # pre-filter BEFORE the (doc_id, token) partial-agg exchange
    docs = table(spark, sf_dir, "documents")
    base = docs.select(F.col("doc_id"), tokens("text").alias("t"))
    t = base.select("doc_id", F.explode("t").alias("token"))
    qtok = (docs.filter(F.col("doc_id") % 83 == 0)
                .select(F.explode(tokens("text")).alias("token"))
                .distinct())
    tf = (t.join(F.broadcast(qtok), "token")
           .groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf")))
    tf_plan = tf._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in tf_plan
    assert "hashpartitioning(doc_id" in tf_plan
    assert "SortMergeJoin" not in tf_plan
