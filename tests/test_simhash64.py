"""Production 64-bit chunked SimHash: banded recall vs brute force.

The pigeonhole guarantee -- any pair within Hamming distance
``n_chunks - 1`` agrees exactly on >= 1 chunk -- must make the banded
equi-join plan return the IDENTICAL pair set to an all-pairs scan of
the same signatures, for any (n_chunks, chunk_bits) configuration.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from esg_decarbonization_data_integration_and_data_pipline_spark.operators.dedup import (
    simhash_chunked, simhash_chunked_band_pairs,
)


def _brute_pairs(sigs: dict[int, list[int]], max_hamming: int) -> set:
    ids = sorted(sigs)
    out = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = sum(bin(x ^ y).count("1")
                    for x, y in zip(sigs[a], sigs[b]))
            if h <= max_hamming:
                out.add((a, b, h))
    return out


@pytest.mark.parametrize("n_chunks,chunk_bits,max_hamming", [
    (4, 16, 3),   # the production 64-bit configuration
    (4, 8, 3),    # the legacy 32-bit shape, chunk-array form
    (8, 16, 7),   # 128-bit: wider signature, looser distance budget
])
def test_banded_pairs_equal_brute_force(spark, sf_dir, n_chunks,
                                        chunk_bits, max_hamming):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sig_rows = (simhash_chunked(docs, n_chunks, chunk_bits)
                .filter(F.col("sig").isNotNull()).collect())
    sigs = {r.doc_id: list(r.sig) for r in sig_rows}
    assert all(len(s) == n_chunks and
               all(0 <= c < (1 << chunk_bits) for c in s)
               for s in sigs.values())
    got = {(r.id_a, r.id_b, r.hamming)
           for r in simhash_chunked_band_pairs(
               docs, max_hamming, n_chunks, chunk_bits).collect()}
    assert got == _brute_pairs(sigs, max_hamming)


def test_recall_guard_rejects_undersized_banding(spark):
    docs = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="max_hamming <= n_chunks - 1"):
        simhash_chunked_band_pairs(docs, max_hamming=4, n_chunks=4)


def test_null_and_empty_text(spark):
    docs = spark.createDataFrame(
        [(0, "hello world"), (1, None), (2, "   "), (3, "")],
        "doc_id long, text string")
    sigs = {r.doc_id: r.sig for r in simhash_chunked(docs).collect()}
    assert sigs[1] is None                 # null text propagates
    assert list(sigs[2]) == [0, 0, 0, 0]   # token-free -> all-zero sig
    assert list(sigs[3]) == [0, 0, 0, 0]
    # the two all-zero docs pair with each other at hamming 0; the
    # null-text doc drops out entirely
    got = {(r.id_a, r.id_b, r.hamming)
           for r in simhash_chunked_band_pairs(docs).collect()}
    assert got == {(2, 3, 0)}


def test_chunk_count_guard(spark):
    docs = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="n_chunks must be <= 8"):
        simhash_chunked(docs, n_chunks=16).collect()


def test_auto_chunk_bits_matches_explicit_suggestion(spark, sf_dir):
    """chunk_bits=None (the default) must size the bucket space from
    the optimizer row estimate via suggest_chunk_bits and produce
    exactly the pairs of the equivalent explicit call (r5 verdict
    task 2: the sizing knob is now the default, not dead code)."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.dedup import (
        _est_rows, suggest_chunk_bits,
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    est = _est_rows(docs)
    assert est is not None and est > 0
    bits = suggest_chunk_bits(est, target_bucket=2, n_chunks=4)
    assert 8 <= bits <= 31
    auto = {(r.id_a, r.id_b, r.hamming)
            for r in simhash_chunked_band_pairs(docs).collect()}
    explicit = {(r.id_a, r.id_b, r.hamming)
                for r in simhash_chunked_band_pairs(
                    docs, chunk_bits=bits).collect()}
    assert auto == explicit
