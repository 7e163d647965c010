"""bpe_encode_docs: the frozen-merge BPE encoder grade (r12 verdict
task #3). Pins (1) that the frozen literal merge table IS what the
sf0.001 trainer produces, (2) that sequential rank-order application
(the DuckDB oracle's replace chain) equals the encoder's
best-rank-first greedy loop on the graded corpora -- the equivalence
the oracle construction rests on, and (3) wrapped-string edge cases
(overlapping merges, multi-occurrence, empty/whitespace docs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import sf_sibling

from esg_decarbonization_data_integration_and_data_pipline_spark.operators.bpe import (
    _merge_word, bpe_segment, train_bpe,
)
# load through the registry module so the query-module import cycle
# (queries -> queries_data -> queries -> queries_misc -> queries_data)
# resolves in its designed order
from esg_decarbonization_data_integration_and_data_pipline_spark.plans import queries as _q  # noqa: F401
from esg_decarbonization_data_integration_and_data_pipline_spark.plans.queries_data import (
    _BPE_FROZEN_MERGES,
)


def test_frozen_merges_match_sf0001_trainer(spark):
    docs = spark.read.parquet(sf_sibling("sf0.001") + "/documents.parquet")
    assert train_bpe(docs, n_merges=8) == _BPE_FROZEN_MERGES


def _encode_best_first(word: str) -> list[str]:
    ranks = {p: i for i, p in enumerate(_BPE_FROZEN_MERGES)}
    syms = list(word)
    while len(syms) > 1:
        pairs = {(syms[i], syms[i + 1]) for i in range(len(syms) - 1)}
        ranked = [(ranks[p], p) for p in pairs if p in ranks]
        if not ranked:
            break
        _, (a, b) = min(ranked)
        syms = _merge_word(syms, a, b)
    return syms


def _encode_sequential(word: str) -> list[str]:
    syms = list(word)
    for a, b in _BPE_FROZEN_MERGES:
        syms = _merge_word(syms, a, b)
    return syms


def test_sequential_equals_best_first_on_corpus(spark):
    """The oracle applies merges in rank order; the engine applies
    best-rank-first. Equal for a well-formed merge list (every pair's
    constituents predate its rank) -- verified on every distinct word
    of the sf0.01 corpus."""
    docs = spark.read.parquet(sf_sibling("sf0.01") + "/documents.parquet")
    words = {w for (t,) in docs.select(F.lower("text")).collect()
             if t for w in t.split()}
    assert words
    for w in words:
        assert _encode_best_first(w) == _encode_sequential(w), w


def test_encoder_edge_cases(spark):
    docs = spark.createDataFrame(
        [(1, "parer orow instlu"),   # chained + adjacent merges
         (2, "ererer"),              # overlapping occurrences: greedy
         (3, "   "),                 # whitespace-only -> 0 tokens
         (4, "p ar"),                # merge must NOT span words
         (5, "PARER")],              # lowercased before encoding
        "doc_id bigint, text string")
    got = {r.doc_id: (r.n_bpe_tokens, r.bpe_text)
           for r in bpe_segment(docs, _BPE_FROZEN_MERGES)
           .select("doc_id", "n_bpe_tokens",
                   F.concat_ws(" ", "bpe_tokens").alias("bpe_text"))
           .collect()}
    # 'parer' -> p a r e r -> (e,r): p a r er -> (a,r): p ar er
    #         -> (p,ar): par er
    assert got[1][1].split()[:2] == ["par", "er"]
    # 'ererer' -> greedy left-to-right (e,r): er er er
    assert got[2] == (3, "er er er")
    assert got[3] == (0, "")
    # words encode independently: 'p' 'ar' stay two tokens
    assert got[4] == (2, "p ar")
    assert got[5] == (2, "par er")
