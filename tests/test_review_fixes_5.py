"""Round-6 review fixes, pinned."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_decontamination_matches_scrubbed_benchmark(spark):
    """The corpus is scrubbed before decontamination, so the
    benchmark must be scrubbed with the same chain -- an eval item
    whose overlap region contains a URL must still be caught."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.pipelines.corpus_curation import curate

    eval_q = ("see https://example.org/answers for the capital of "
              "the example country in question")
    docs = spark.createDataFrame(
        [(1, "a perfectly ordinary training document with plenty of "
             "its own words and no overlap at all"),
         (2, f"leaked: {eval_q} and some more text")],
        "doc_id bigint, text string")
    bench = spark.createDataFrame([(100, eval_q)],
                                  "doc_id bigint, text string")
    out = curate(docs, min_quality=0.0, max_repetition=None,
                 benchmark=bench, decontam_n=5)
    assert [r.doc_id for r in out.collect()] == [1]


def test_decontaminate_flags_id_collision_toggle(spark):
    """With an external benchmark whose ids collide with corpus ids,
    exclude_benchmark_ids=False must still flag the colliding doc."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.text import decontaminate_flags

    leak = "shared five gram run of words here"
    docs = spark.createDataFrame(
        [(7, f"contaminated doc containing the {leak} verbatim")],
        "doc_id bigint, text string")
    bench = spark.createDataFrame([(7, f"eval item with {leak} inside")],
                                  "doc_id bigint, text string")
    # default (same-table semantics): the colliding id is exempt
    assert decontaminate_flags(docs, bench, n=5).count() == 0
    # external-eval semantics: it is scanned and flagged
    got = decontaminate_flags(docs, bench, n=5,
                              exclude_benchmark_ids=False).collect()
    assert [r.doc_id for r in got] == [7] and got[0].n_hits >= 1


def test_semdedup_ivf_raises_without_seed_ids(spark):
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.similarity import semdedup_prune_ivf

    df = spark.createDataFrame(
        [(1000 + i, [float(i), 1.0, 0.0]) for i in range(6)],
        "vec_id bigint, embedding array<float>")
    with pytest.raises(ValueError, match="no seed centroids"):
        semdedup_prune_ivf(df, threshold=0.9, n_cells=16)


def test_semdedup_leaves_no_cache_entries(spark):
    """_canonical_labels releases the dup_clusters cache internally;
    materializing a semdedup result must leave the CacheManager
    empty (checkpoint blocks are GC-managed and excluded)."""
    import numpy as np

    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.similarity import semdedup_prune

    spark.catalog.clearCache()
    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in rng.normal(size=16)])
            for i in range(12)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    out = semdedup_prune(df, threshold=0.99, dim=16)
    assert out.count() == 12
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_incremental_base_released_by_streaming_caller(spark, tmp_path):
    """The streaming ingest manages the signature working set itself
    and releases it per trigger -- no cache accumulation across
    batches."""
    import os

    from esg_decarbonization_data_integration_and_data_pipline_spark.streaming.docs_dedup import (
        seed_index, stream_dedup_ingest,
    )

    src = str(tmp_path / "src"); os.makedirs(src)
    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")
    seed_index(spark, index)
    spark.catalog.clearCache()
    for b, rows in enumerate([[(1, "alpha beta gamma delta")],
                              [(2, "epsilon zeta eta theta")]]):
        (spark.createDataFrame(rows, "doc_id bigint, text string")
              .coalesce(1).write.mode("overwrite")
              .parquet(os.path.join(src, f"b{b}")))
        sdf = spark.readStream.schema("doc_id bigint, text string").parquet(src + "/*")
        q = stream_dedup_ingest(sdf, corpus, index, ckpt, threshold=0.3)
        q.awaitTermination()
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()
    assert spark.read.parquet(corpus).count() == 2
