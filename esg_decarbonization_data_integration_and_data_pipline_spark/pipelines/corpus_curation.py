"""End-to-end training-corpus curation: the canonical LLM-data
pipeline assembled from the engine's first-class operators.

    PII scrub -> lang-id -> quality gates (score, repetition,
    char-entropy, boilerplate share) -> benchmark decontamination ->
    near-dup clustering -> canonical doc per cluster ->
    deterministic train/eval/test split

Every stage is one of the oracle-checked operators (text.scrub_pii,
text.lang_scores, text.quality_features, text.char_entropy,
text.boilerplate_share, text.decontaminate_flags,
dedup.minhash_verified_pairs + dedup.dup_clusters,
sampling.deterministic_split); this module only composes them, so
the 100 TB properties compose too: narrow scrub/scoring passes, two
partial-agg gram shuffles per optional gate, a broadcast benchmark
join, the banded LSH candidate join, O(diameter) cluster rounds, and
a shuffle-free split. The canonical-doc pick is min doc id per
cluster -- deterministic, and exactly the reference's keep-first
convention for duplicate uploads (jobs/csr_etl.py:75-119 keeps the
authoritative row per key the same way).

Cache note: the near-dup fixpoint labels stay cached (the
``dup_clusters`` contract); long-lived sessions should clear it
after materializing the curated output.
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
    PII_PATTERNS, boilerplate_share, char_entropy, decontaminate_flags,
    lang_scores, quality_features, repetition_stats, unigram_nll,
)


def curate(docs: DataFrame, keep_langs: list[str] | None = None,
           min_quality: float = 0.3, near_dup_threshold: float = 0.5,
           max_repetition: float | None = 0.9,
           fractions: dict[str, float] | None = None,
           scrub: bool = True,
           min_entropy: float | None = None,
           max_boilerplate: float | None = None,
           boilerplate_n: int = 3, boilerplate_min_docs: int = 2,
           benchmark: DataFrame | None = None,
           decontam_n: int = 5,
           max_nll: float | None = None) -> DataFrame:
    """documents(doc_id, text, ...) -> curated corpus with
    (predicted_lang, quality_score, cluster_id, is_canonical, split).

    Rows failing the language, quality, repetition, entropy, or
    boilerplate gate drop; docs sharing any ``decontam_n``-gram with
    ``benchmark`` (an eval set) drop; every survivor keeps its
    near-dup cluster id and the canonical flag, so callers can either
    train on canonicals only or weight by cluster size.

    - ``scrub`` (default on): PII/URL redaction BEFORE anything else
      sees the text -- fingerprints, dedup signatures, and the split
      hash all key on the scrubbed text, so two docs differing only
      in redacted emails dedup together and can't straddle splits.
    - ``min_entropy``: drop docs whose character-level Shannon
      entropy falls below it (base64 blobs, padding spam; natural
      text sits ~4-4.5 bits). None disables.
    - ``max_boilerplate``: drop docs whose share of distinct word
      ``boilerplate_n``-grams shared by >= ``boilerplate_min_docs``
      docs exceeds it (template chrome). None disables. Docs too
      short to have n-grams count as share 0.
    - ``max_repetition``: docs whose duplicate-bigram ratio exceeds
      it are boilerplate/spam; None disables.
    - ``benchmark``: decontamination eval set (same doc_id/text
      shape); its n-grams broadcast, the corpus is never shuffled on
      gram strings. None disables.
    - ``max_nll``: drop docs whose mean token NLL under the corpus's
      own unigram LM exceeds it (perplexity-proxy gate: vocabulary-
      mismatched / gibberish docs score high). None disables. Docs
      with no tokens count as failing (no evidence of fluency).
    """
    if scrub:
        # narrow in-place rewrite (same regexp chain scrub_pii
        # applies -- one shared pattern table, no join-back shuffle)
        clean = F.col("text")
        for _name, pat, token in PII_PATTERNS:
            clean = F.regexp_replace(clean, pat, token)
        docs = docs.withColumn("text", clean)
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
    # Materialize the post-narrow-gate working set AND truncate its
    # lineage (localCheckpoint, not cache): every remaining stage
    # (entropy/boilerplate gates join kept against aggregates OF
    # kept, decontamination scans it, minhash signatures scan it, the
    # final label join reads it again) would otherwise replay the
    # scoring kernels per pass -- and the dup-cluster fixpoint loop
    # re-ANALYZES its input plan every round with the labels subtree
    # doubling per round, so a deep gate lineage under it makes
    # Catalyst planning the dominant cost (measured 58 s -> 9 s at
    # sf0.1 from this one truncation). Standard curation working-set
    # materialization: ~1x corpus bytes in MEMORY_AND_DISK blocks,
    # freed on session GC; a reliable checkpoint dir replaces this
    # under executor loss on a real cluster.
    kept = kept.localCheckpoint()
    if min_entropy is not None:
        ent = char_entropy(kept).select(
            "doc_id", F.col("entropy").alias("__ent"))
        kept = (kept.join(ent, "doc_id", "left")
                    .filter(F.coalesce(F.col("__ent"), F.lit(0.0))
                            >= min_entropy)
                    .drop("__ent"))
    if max_boilerplate is not None:
        bshare = boilerplate_share(
            kept, n=boilerplate_n, min_docs=boilerplate_min_docs).select(
            "doc_id", F.col("boiler_share").alias("__bshare"))
        kept = (kept.join(bshare, "doc_id", "left")
                    .filter(F.coalesce(F.col("__bshare"), F.lit(0.0))
                            <= max_boilerplate)
                    .drop("__bshare"))
    if max_nll is not None:
        nll = unigram_nll(kept).select(
            "doc_id", F.col("nll").alias("__nll"))
        kept = (kept.join(nll, "doc_id", "left")
                    .filter(F.coalesce(F.col("__nll"),
                                       F.lit(float("inf")))
                            <= max_nll)
                    .drop("__nll"))
    if benchmark is not None:
        if scrub:
            # compare like with like: the corpus text was scrubbed
            # above, so benchmark n-grams spanning an email/URL/phone
            # would never match unless the benchmark is scrubbed with
            # the SAME chain (review finding: a leaked eval item
            # citing a URL would otherwise survive decontamination)
            bclean = F.col("text")
            for _name, pat, token in PII_PATTERNS:
                bclean = F.regexp_replace(bclean, pat, token)
            benchmark = benchmark.withColumn("text", bclean)
        # external eval sets have unrelated id spaces -- id-collision
        # exemption would skip real docs, so scan everything
        contaminated = decontaminate_flags(kept, benchmark, n=decontam_n,
                                           exclude_benchmark_ids=False)
        kept = kept.join(contaminated.select("doc_id"), "doc_id",
                         "left_anti")

    # Second (post-gate) materialization: the surviving working set
    # feeds FIVE consumers (minhash signatures, the cluster id list,
    # the final label join, and -- through them -- every convergence
    # round), each of which would otherwise replay the whole gate
    # join/aggregate chain; measured at sf0.1/local[32], the replay
    # multiplied the nll gate's one-pass ~5 s into ~60 s. Two
    # corpus-sized block sets total (pre-gate kernels + post-gate
    # survivors); both freed on session GC.
    kept = kept.localCheckpoint()
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


def curation_funnel(docs: DataFrame, **curate_kwargs) -> list[tuple[str, int]]:
    """Per-gate funnel counts for a ``curate`` configuration -- the
    observability a production curation run reports (how many docs
    each gate dropped), computed WITHOUT running the expensive dedup
    stage: the funnel re-applies only the gate chain, counting after
    each stage.

    Returns [(stage, surviving_docs), ...] in pipeline order,
    starting with ('input', N) and ending with the decontamination
    survivors ('decontaminated', M) -- M is exactly the corpus the
    dedup/split stages of ``curate`` would see. Counts are actions
    (one job per stage over the checkpointed working set); this is a
    reporting tool, not a data path.
    """
    gates = dict(curate_kwargs)
    out = [("input", docs.count())]

    scrub = gates.get("scrub", True)
    if scrub:
        clean = F.col("text")
        for _name, pat, token in PII_PATTERNS:
            clean = F.regexp_replace(clean, pat, token)
        docs = docs.withColumn("text", clean)
    scored = quality_features(lang_scores(docs))
    kept = scored.filter(
        F.col("quality_score") >= gates.get("min_quality", 0.3))
    out.append(("quality", kept.count()))
    keep_langs = gates.get("keep_langs")
    if keep_langs:
        kept = kept.filter(F.col("predicted_lang").isin(keep_langs))
        out.append(("language", kept.count()))
    max_repetition = gates.get("max_repetition", 0.9)
    if max_repetition is not None:
        kept = (repetition_stats(kept)
                .filter(F.coalesce(F.col("repetition_ratio"), F.lit(0.0))
                        <= max_repetition)
                .drop("total_bigrams", "distinct_bigrams",
                      "repetition_ratio", "top_gram_share"))
        out.append(("repetition", kept.count()))
    kept = kept.localCheckpoint()
    min_entropy = gates.get("min_entropy")
    if min_entropy is not None:
        ent = char_entropy(kept).select(
            "doc_id", F.col("entropy").alias("__ent"))
        kept = (kept.join(ent, "doc_id", "left")
                    .filter(F.coalesce(F.col("__ent"), F.lit(0.0))
                            >= min_entropy).drop("__ent"))
        out.append(("entropy", kept.count()))
    max_boilerplate = gates.get("max_boilerplate")
    if max_boilerplate is not None:
        bshare = boilerplate_share(
            kept, n=gates.get("boilerplate_n", 3),
            min_docs=gates.get("boilerplate_min_docs", 2)).select(
            "doc_id", F.col("boiler_share").alias("__b"))
        kept = (kept.join(bshare, "doc_id", "left")
                    .filter(F.coalesce(F.col("__b"), F.lit(0.0))
                            <= max_boilerplate).drop("__b"))
        out.append(("boilerplate", kept.count()))
    max_nll = gates.get("max_nll")
    if max_nll is not None:
        nll = unigram_nll(kept).select(
            "doc_id", F.col("nll").alias("__nll"))
        kept = (kept.join(nll, "doc_id", "left")
                    .filter(F.coalesce(F.col("__nll"), F.lit(float("inf")))
                            <= max_nll).drop("__nll"))
        out.append(("unigram_nll", kept.count()))
    benchmark = gates.get("benchmark")
    if benchmark is not None:
        if scrub:
            bclean = F.col("text")
            for _name, pat, token in PII_PATTERNS:
                bclean = F.regexp_replace(bclean, pat, token)
            benchmark = benchmark.withColumn("text", bclean)
        contaminated = decontaminate_flags(
            kept, benchmark, n=gates.get("decontam_n", 5),
            exclude_benchmark_ids=False)
        kept = kept.join(contaminated.select("doc_id"), "doc_id",
                         "left_anti")
        out.append(("decontaminated", kept.count()))
    return out
