"""Round-6 operators: unigram-LM NLL, mixture sampling, SemDeDup."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from esg_decarbonization_data_integration_and_data_pipline_spark.operators.sampling import (
    mixture_sample,
)
from esg_decarbonization_data_integration_and_data_pipline_spark.operators.similarity import (
    semdedup_prune,
)
from esg_decarbonization_data_integration_and_data_pipline_spark.operators.text import (
    unigram_nll,
)


def test_unigram_nll_hand_computed(spark):
    # corpus: 'a a b' + 'c' -> counts a:2, b:1, c:1, total 4
    docs = spark.createDataFrame([(1, "a a b"), (2, "c")],
                                 "doc_id bigint, text string")
    got = {r.doc_id: r for r in unigram_nll(docs).collect()}
    # doc 1: -(2*log2(2/4) + 1*log2(1/4)) / 3 = (2*1 + 2) / 3
    assert got[1].n_tokens == 3
    assert got[1].nll == pytest.approx(4 / 3, abs=1e-6)
    assert got[2].n_tokens == 1
    assert got[2].nll == pytest.approx(2.0, abs=1e-6)


def test_unigram_nll_flags_vocabulary_mismatch(spark):
    common = [(i, "the quick brown fox jumps over the lazy dog")
              for i in range(1, 9)]
    rare = [(100, "zxqv wkjy pqmn vbxz qqzz")]
    docs = spark.createDataFrame(common + rare,
                                 "doc_id bigint, text string")
    out = {r.doc_id: r.nll for r in unigram_nll(docs).collect()}
    assert out[100] > out[1]           # OOV-ish doc scores worse
    # null/empty texts drop out rather than erroring
    with_null = spark.createDataFrame(
        [(1, "a b"), (2, None), (3, "")], "doc_id bigint, text string")
    assert {r.doc_id for r in unigram_nll(with_null).collect()} == {1}


def test_mixture_sample_composition_and_determinism(spark):
    rows = [(i, f"doc number {i} from web", "web") for i in range(100)]
    rows += [(1000 + i, f"doc number {i} of books", "books")
             for i in range(20)]
    rows += [(2000 + i, f"doc number {i} in code", "code")
             for i in range(50)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    weights = {"web": 0.6, "books": 0.2, "code": 0.2}
    out = mixture_sample(docs, weights)
    # N = min(100/.6, 20/.2, 50/.2) = min(166, 100, 250) = 100
    counts = {r.source: r.n for r in
              out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts == {"web": 60, "books": 20, "code": 20}
    # deterministic and nested: same sample both times
    again = mixture_sample(docs, weights)
    assert (sorted(r.doc_id for r in out.collect())
            == sorted(r.doc_id for r in again.collect()))
    # unlisted source excluded entirely
    assert out.filter("source = 'other'").count() == 0


def test_mixture_sample_infeasible_and_bad_weights(spark):
    docs = spark.createDataFrame([(1, "x", "web")],
                                 "doc_id bigint, text string, source string")
    # weighted source with no rows -> empty (mixture infeasible)
    assert mixture_sample(docs, {"web": 0.5, "books": 0.5}).count() == 0
    with pytest.raises(ValueError):
        mixture_sample(docs, {"web": 0.0})
    with pytest.raises(ValueError):
        mixture_sample(docs, {})


def test_semdedup_prune_invariants(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.normal(size=(10, 64)).astype("float32")
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        # near-duplicate: tiny perturbation, cosine ~1
        rows.append((100 + i, [float(x) for x in v + 0.001 * rng.normal(size=64)]))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    out = semdedup_prune(df, threshold=0.99, dim=64).cache()
    got = {r.vec_id: r for r in out.collect()}
    assert len(got) == 20
    for i in range(10):
        # each twin pair clusters together; canonical is the min id
        assert got[i].cluster_id == got[100 + i].cluster_id == i
        assert got[i].is_canonical == 1 and got[100 + i].is_canonical == 0
    # every cluster has exactly one canonical member
    per = out.groupBy("cluster_id").agg(F.sum("is_canonical").alias("k"))
    assert per.filter("k <> 1").count() == 0
    out.unpersist()
    spark.catalog.clearCache()


def test_semdedup_prune_ivf_invariants(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    base = rng.normal(size=(8, 64)).astype("float32")
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        rows.append((100 + i,
                     [float(x) for x in v + 0.001 * rng.normal(size=64)]))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.similarity import (
        semdedup_prune_ivf,
    )
    out = semdedup_prune_ivf(df, threshold=0.99, n_cells=4).cache()
    got = {r.vec_id: r for r in out.collect()}
    assert len(got) == 16
    for i in range(8):
        # a twin has cosine ~1 with its original, so they share the
        # nearest cell and must cluster together
        assert got[i].cluster_id == got[100 + i].cluster_id == i
        assert got[i].is_canonical == 1 and got[100 + i].is_canonical == 0
    per = out.groupBy("cluster_id").agg(F.sum("is_canonical").alias("k"))
    assert per.filter("k <> 1").count() == 0
    out.unpersist()
    spark.catalog.clearCache()


def test_sq_topk_exact_when_rerank_covers_corpus(spark, sf_dir):
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.similarity import (
        cosine_topk, sq_topk,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") == 0)
    n = e.count()
    exact = [(r.vec_id, r.cosine) for r in cosine_topk(e, q, 10).collect()]
    quant = [(r.vec_id, r.cosine)
             for r in sq_topk(e, q, 10, rerank=n).collect()]
    assert quant == exact
    # narrow rerank still recovers the top hit (the query itself)
    narrow = sq_topk(e, q, 3, rerank=5).collect()
    assert narrow[0].vec_id == 0 and narrow[0].cosine == 1.0


def test_sq_quantize_bounds_and_zero_vector(spark):
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.similarity import (
        sq_quantize,
    )

    df = spark.createDataFrame(
        [(1, [1.0, -2.0, 0.5]), (2, [0.0, 0.0, 0.0])],
        "vec_id bigint, embedding array<float>")
    got = {r.vec_id: r for r in sq_quantize(df).collect()}
    assert got[2].scale == 0.0 and got[2].qv == [0, 0, 0]
    s = got[1].scale
    assert s == pytest.approx(2.0 / 127, abs=1e-9)
    # dequantized error bounded by scale/2 per component
    for orig, q in zip([1.0, -2.0, 0.5], got[1].qv):
        assert abs(q * s - orig) <= s / 2 + 1e-12
    assert max(abs(x) for x in got[1].qv) <= 127


def test_chunk_overlap_catches_containment_jaccard_misses(spark):
    """A 16-token quote inside a 200-token doc: whole-doc Jaccard is
    tiny (minhash misses it at any useful threshold), but the
    aligned shared chunk pairs them -- with share_a ~1 flagging the
    short side as contained."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.dedup import (
        chunk_overlap_pairs, minhash_verified_pairs,
    )

    quote = " ".join(f"quoted{i}" for i in range(16))
    long_doc = quote + " " + " ".join(f"filler{i}" for i in range(184))
    docs = spark.createDataFrame(
        [(1, quote), (2, long_doc)], "doc_id bigint, text string")
    got = chunk_overlap_pairs(docs, chunk_tokens=16).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.id_a, r.id_b, r.n_shared_chunks) == (1, 2, 1)
    assert r.share_a == 1.0 and r.share_b < 0.2
    # whole-doc Jaccard on the same pair is ~0.08 -- below any
    # near-dup threshold, so the minhash path reports nothing
    assert minhash_verified_pairs(docs, threshold=0.3).count() == 0
    spark.catalog.clearCache()


def test_chunk_overlap_boilerplate_cap_and_min_shared(spark):
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.dedup import (
        chunk_overlap_pairs,
    )

    chrome = " ".join(f"chrome{i}" for i in range(16))
    rows = [(i, chrome + " " + " ".join(f"own{i}w{j}" for j in range(16)))
            for i in range(1, 6)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    # the chrome chunk appears in 5 docs: allowed at cap 50 -> all
    # 10 pairs; capped at 4 -> suppressed entirely
    assert chunk_overlap_pairs(docs, chunk_tokens=16).count() == 10
    assert chunk_overlap_pairs(docs, chunk_tokens=16,
                               max_docs_per_chunk=4).count() == 0
    # min_shared=2 requires two shared chunks -> none here
    assert chunk_overlap_pairs(docs, chunk_tokens=16,
                               min_shared=2).count() == 0
