"""Streaming corpus ingest with incremental near-dup detection.

Each micro-batch of documents is deduped against the PERSISTED
minhash signature store (operators/dedup.minhash_write_index /
minhash_incremental_pairs) and against itself; surviving canonical
docs merge into the corpus, flagged pairs append to an audit table,
and the batch's signatures append to the index so the NEXT batch
sees them. This is the streaming twin of the batch
`corpus_curation` dedup stage: a crawl feed dedups continuously with
O(batch + candidate-term) work per trigger -- the historical corpus
text is never rescanned (the index contributes pruned (id, mh) /
(id, hs) parquet scans only).

Replay semantics (a micro-batch re-runs when a failure lands before
the checkpoint commit): the corpus write is the keyed
``replace_keys`` merge every batch loader uses, so a replayed batch
CONVERGES instead of duplicating; re-appending identical signature
rows makes the index a multiset, which changes no pair decision
(the candidate stage is set-semantics via distinct) and is bounded
by the replay count; the audit table is at-least-once by design
(batch_id disambiguates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from esg_decarbonization_data_integration_and_data_pipline_spark.operators.dedup import (
    dedup_merge_batch, minhash_write_index,
)


def seed_index(spark, index_path: str, docs: DataFrame | None = None,
               id_col: str = "doc_id", text_col: str = "text") -> None:
    """Create the signature store ``stream_dedup_ingest`` requires:
    from an existing corpus, or EMPTY (schema-only parquet) for a
    from-scratch feed."""
    if docs is None:
        docs = spark.createDataFrame(
            [], f"{id_col} bigint, {text_col} string")
    minhash_write_index(docs, index_path, id_col=id_col, text_col=text_col)


def stream_dedup_ingest(sdf: DataFrame, corpus_path: str, index_path: str,
                        checkpoint: str, threshold: float = 0.5,
                        id_col: str = "doc_id", text_col: str = "text",
                        query_name: str = "docs_dedup_ingest"):
    """documents stream -> deduped corpus + signature index + dup audit.

    Requires a seeded index (``seed_index``; empty is fine). Per
    micro-batch: (1) incremental pairs vs the index AND within the
    batch; (2) docs with any index match drop as known dups; (3)
    batch-internal dup groups keep their min id (the
    ``corpus_curation`` canonical convention); (4) survivors merge
    into ``corpus_path`` (idempotent keyed merge) and their
    signatures append to ``index_path``; all flagged pairs append to
    ``<corpus_path>_dups``.

    Returns the started query; callers own awaitTermination.
    """
    dups_path = corpus_path.rstrip("/") + "_dups"

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        batch = batch_df.localCheckpoint()  # one materialization; short lineage
        # the keep-rule/merge/index-append protocol lives in ONE
        # place (dedup.dedup_merge_batch, shared with
        # incremental_curate); this wrapper only adds the audit write
        _n, pairs = dedup_merge_batch(
            spark, batch, corpus_path, index_path, threshold,
            id_col=id_col, text_col=text_col)
        (pairs.withColumn("batch_id", F.lit(batch_id))
              .write.mode("append").parquet(dups_path))

    return (sdf.writeStream.foreachBatch(ingest)
               .option("checkpointLocation", checkpoint)
               .queryName(query_name)
               .trigger(availableNow=True)
               .start())
