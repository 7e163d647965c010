"""Bigram-LM NLL (operators/text.bigram_nll): hand-computed values,
word-order sensitivity (the capability unigram NLL lacks), null/short
doc handling, and the single-scan executed plan (exchange reuse)."""

from __future__ import annotations

import math

import pytest

from esg_decarbonization_data_integration_and_data_pipline_spark.operators.text import (
    bigram_nll, unigram_nll,
)


def test_bigram_nll_hand_computed(spark):
    # corpus pairs: doc1 'a a b' -> (a,a),(a,b); doc2 'a b' -> (a,b)
    # c(a,a)=1, c(a,b)=2, c_left(a)=3
    docs = spark.createDataFrame([(1, "a a b"), (2, "a b")],
                                 "doc_id bigint, text string")
    got = {r.doc_id: r for r in bigram_nll(docs).collect()}
    assert got[1].n_bigrams == 2
    assert got[1].bigram_nll == pytest.approx(
        (-math.log2(1 / 3) - math.log2(2 / 3)) / 2, abs=1e-6)
    assert got[2].n_bigrams == 1
    assert got[2].bigram_nll == pytest.approx(-math.log2(2 / 3), abs=1e-6)


def test_bigram_nll_flags_word_salad_unigram_misses(spark):
    """A scrambled doc reuses the corpus's exact vocabulary (its
    unigram NLL matches the fluent docs') but its word ORDER is
    unseen -- only the bigram model separates them."""
    fluent = [(i, "the cat sat on the mat") for i in range(1, 9)]
    salad = [(100, "mat the on sat the cat")]
    docs = spark.createDataFrame(fluent + salad,
                                 "doc_id bigint, text string")
    uni = {r.doc_id: r.nll for r in unigram_nll(docs).collect()}
    bi = {r.doc_id: r.bigram_nll for r in bigram_nll(docs).collect()}
    assert uni[100] == pytest.approx(uni[1], abs=1e-6)
    assert bi[100] > bi[1] + 1.0


def test_bigram_nll_short_and_null_docs_drop_out(spark):
    docs = spark.createDataFrame(
        [(1, "a b"), (2, None), (3, ""), (4, "   "), (5, "one")],
        "doc_id bigint, text string")
    assert {r.doc_id for r in bigram_nll(docs).collect()} == {1}


def test_bigram_nll_executes_with_one_corpus_scan(spark, sf_dir):
    """The three aggregate lineages (doc-bigram tf, corpus bigram
    counts, left-token marginal) must collapse onto ONE scan via
    exchange reuse in the executed plan -- the property the explicit
    not-null pair filter exists to protect (asymmetric inferred
    filters break subtree canonicalization and re-scan the corpus
    per branch)."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.plans.queries import REGISTRY

    df = REGISTRY["text_bigram_nll"].fn(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))
    final = plan[:plan.index("== Initial Plan ==")] \
        if "== Initial Plan ==" in plan else plan
    assert final.count("Scan parquet") == 1
    assert "ReusedExchange" in final
