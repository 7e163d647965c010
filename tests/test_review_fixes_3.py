"""Round-5 review fixes (ADVICE.md r4)."""

from __future__ import annotations

import pytest


def test_resize_payloads_propagates_null_payloads(spark):
    """A corpus with null texts (null encode -> null payload) must
    yield null rows from resize_payloads, not an Arrow-worker crash
    (mirrors extract_features' null propagation)."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.multimodal import (
        resize_payloads, with_binary_payload,
    )

    docs = spark.createDataFrame(
        [(1, "a" * 300), (2, None)], "doc_id bigint, text string")
    rows = {r.doc_id: r
            for r in resize_payloads(with_binary_payload(docs), 64, 64)
            .collect()}
    assert rows[1].payload_bytes == 64
    assert rows[2].payload is None
    assert rows[2].width is None and rows[2].height is None
    assert rows[2].payload_bytes is None


def test_simhash_chunked_rejects_out_of_range_chunk_bits(spark):
    """chunk_bits > 31 would address bits beyond the mod-2^31-1 hash
    range (constantly zero -> silent recall loss); reject loudly."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.dedup import simhash_chunked

    docs = spark.createDataFrame([(1, "hello world")],
                                 "doc_id bigint, text string")
    for bad in (0, 32, 64):
        with pytest.raises(ValueError, match="chunk_bits"):
            simhash_chunked(docs, chunk_bits=bad)
    # boundary value stays accepted
    assert simhash_chunked(docs, chunk_bits=31).count() == 1


def test_ngram_doc_freq_edges(spark):
    """Null texts and short docs (< n tokens) produce no grams; the
    min_docs filter counts DISTINCT docs (repeats within one doc
    count once)."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.text import ngram_doc_freq

    docs = spark.createDataFrame(
        [(1, "a b c a b c"),   # 'a b c' twice in ONE doc
         (2, "a b c x"),
         (3, "a b"),           # too short for 3-grams
         (4, None)],
        "doc_id bigint, text string")
    rows = {r.gram: r.n_docs
            for r in ngram_doc_freq(docs, n=3, min_docs=2).collect()}
    assert rows == {"a b c": 2}  # doc1's repeat did not inflate it


def test_decontaminate_flags_excludes_benchmark_and_counts_distinct(spark):
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.text import decontaminate_flags

    corpus = spark.createDataFrame(
        [(1, "q w e r t y"),          # contains 'q w e r' + 'w e r t'...
         (2, "zz xx cc vv"),          # clean
         (10, "q w e r t y u")],      # benchmark doc itself
        "doc_id bigint, text string")
    bench = corpus.filter("doc_id = 10")
    rows = {r.doc_id: r.n_hits
            for r in decontaminate_flags(corpus, bench, n=4).collect()}
    assert 10 not in rows and 2 not in rows
    # doc1's 4-grams: 'q w e r','w e r t','e r t y' -- all in benchmark
    assert rows == {1: 3}


def test_scrub_pii_redacts_and_counts(spark):
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.text import scrub_pii

    docs = spark.createDataFrame(
        [(1, "mail a@b.co or c.d+x@e.org, see https://x.io/p?q=1 "
             "call +1 (555) 123-4567 now"),
         (2, "clean text"),
         (3, None)],
        "doc_id bigint, text string")
    rows = {r.doc_id: r for r in scrub_pii(docs).collect()}
    assert rows[1].n_email == 2 and rows[1].n_url == 1 and rows[1].n_phone == 1
    assert "<EMAIL>" in rows[1].clean_text
    assert "<URL>" in rows[1].clean_text and "<PHONE>" in rows[1].clean_text
    assert "a@b.co" not in rows[1].clean_text
    assert rows[2].clean_text == "clean text" and rows[2].n_email == 0
    assert rows[3].clean_text is None and rows[3].n_email is None


def test_char_entropy_known_values(spark):
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.text import char_entropy

    docs = spark.createDataFrame(
        [(1, "aaaa"),      # one symbol -> H = 0
         (2, "aabb"),      # two equiprobable -> H = 1
         (3, "abcd"),      # four equiprobable -> H = 2
         (4, "")],         # empty -> no row (explode yields nothing)
        "doc_id bigint, text string")
    rows = {r.doc_id: (r.n_chars, r.entropy)
            for r in char_entropy(docs).collect()}
    assert rows == {1: (4, 0.0), 2: (4, 1.0), 3: (4, 2.0)}


def test_suggest_chunk_bits_bounds():
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.dedup import suggest_chunk_bits

    assert suggest_chunk_bits(0) == 16
    assert suggest_chunk_bits(100) == 16          # floor: narrower than
    assert suggest_chunk_bits(100_000) == 16      # 16 bits never wins
    assert suggest_chunk_bits(10**7) == 21        # grows past the floor
    assert suggest_chunk_bits(10**12) == 31       # ceiling
    # monotone non-decreasing in corpus size
    vals = [suggest_chunk_bits(10**k) for k in range(2, 13)]
    assert vals == sorted(vals)
