"""End-to-end training-corpus curation: the canonical LLM-data
pipeline assembled from the engine's first-class operators.

    lang-id -> quality filter -> near-dup clustering -> canonical
    doc per cluster -> deterministic train/eval/test split

Every stage is one of the oracle-checked operators (text.lang_scores,
text.quality_features, dedup.minhash_verified_pairs +
dedup.dup_clusters, sampling.deterministic_split); this module only
composes them, so the 100 TB properties compose too: narrow scoring
passes, the banded LSH candidate join, O(diameter) cluster rounds,
and a shuffle-free split. The canonical-doc pick is min doc id per
cluster -- deterministic, and exactly the reference's keep-first
convention for duplicate uploads (jobs/csr_etl.py:75-119 keeps the
authoritative row per key the same way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from esg_decarbonization_data_integration_and_data_pipline_spark.operators.dedup import (
    dup_clusters, minhash_verified_pairs,
)
from esg_decarbonization_data_integration_and_data_pipline_spark.operators.sampling import (
    deterministic_split,
)
from esg_decarbonization_data_integration_and_data_pipline_spark.operators.text import (
    lang_scores, quality_features, repetition_stats,
)


def curate(docs: DataFrame, keep_langs: list[str] | None = None,
           min_quality: float = 0.3, near_dup_threshold: float = 0.5,
           max_repetition: float | None = 0.9,
           fractions: dict[str, float] | None = None) -> DataFrame:
    """documents(doc_id, text, ...) -> curated corpus with
    (predicted_lang, quality_score, cluster_id, is_canonical, split).

    Rows failing the language, quality, or repetition gate drop
    (``max_repetition``: docs whose duplicate-bigram ratio exceeds it
    are boilerplate/spam; None disables the gate); every survivor
    keeps its near-dup cluster id and the canonical flag, so callers
    can either train on canonicals only or weight by cluster size.
    """
    scored = quality_features(lang_scores(docs))
    kept = scored.filter(F.col("quality_score") >= min_quality)
    if keep_langs:
        kept = kept.filter(F.col("predicted_lang").isin(keep_langs))
    if max_repetition is not None:
        kept = (repetition_stats(kept)
                .filter(F.coalesce(F.col("repetition_ratio"), F.lit(0.0))
                        <= max_repetition)
                .drop("total_bigrams", "distinct_bigrams",
                      "repetition_ratio", "top_gram_share"))

    pairs = minhash_verified_pairs(kept, threshold=near_dup_threshold)
    clusters = dup_clusters(kept, pairs)
    canonical = (clusters.groupBy("cluster_id")
                 .agg(F.min("doc_id").alias("__canon")))
    labeled = (kept.join(clusters, "doc_id")
                   .join(F.broadcast(canonical), "cluster_id")
                   .withColumn("is_canonical",
                               F.col("doc_id") == F.col("__canon"))
                   .drop("__canon"))
    out = deterministic_split(
        labeled, "text", fractions or {"train": 0.8, "eval": 0.1,
                                       "test": 0.1})
    return out.select("doc_id", "text", "predicted_lang",
                      "quality_score", "cluster_id", "is_canonical",
                      "split")
