"""Streaming exact-dedup ingest: bloom pre-filter + versioned commits.

The continuous-ingest composition of this round's two tiers: each
micro-batch is exact-deduped against the corpus in O(batch) -- a
partitioned-bloom probe answers "certainly new" for the novel
majority (operators/bloom), only the maybe-seen sliver touches the
fingerprint INDEX (a narrow one-column versioned table; corpus text
is never rescanned) -- and the survivors commit as one new version of
a manifest-committed corpus table (io/versioned), snapshot-isolated
from every concurrent reader.

This is the exact-dedup twin of :mod:`docs_dedup` (near-dup minhash
ingest into a plain keyed-merge corpus): use this one when identity
means byte-equality and readers need snapshot isolation.

State layout under ``state_dir``:
- ``fp``    -- versioned table, one ``fp_md5`` column: every text
  fingerprint ever admitted (the exact-verify side).
- ``bloom`` -- versioned table of per-bucket bloom rows: the compact
  front-end; rebuilt rows committed as full snapshots per batch
  (the table is #buckets rows -- pointer-flip-sized).

Crash/replay correctness (a micro-batch re-runs whenever failure
lands before the checkpoint commit) -- every step is idempotent or
txn-guarded, so ANY crash point converges:
- corpus + fp appends carry per-(checkpoint, batch) txn markers:
  a replayed append returns the current version unchanged
  (exactly-once, io/versioned semantics).
- the bloom commit is convergent by construction: re-OR-ing the same
  keys changes no bits, and on the replay path the batch's docs are
  either already admitted (novel recomputes empty -- nothing to
  re-add) or the bloom is stale (novel recomputes as the same docs
  and the update lands this time).  A stale bloom can never
  double-admit: the corpus append's txn marker refuses the replay
  regardless of what the probe said.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from esg_decarbonization_data_integration_and_data_pipline_spark.operators.bloom import (
    bloom_build, bloom_new_docs_indexed, bloom_update,
)
from esg_decarbonization_data_integration_and_data_pipline_spark.streaming import checkpoint_identity
from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
    append_version, compact_table, read_current, vacuum, write_version,
)


def seed_bloom_state(spark: SparkSession, state_dir: str,
                     corpus: DataFrame | None = None,
                     text_col: str = "text",
                     n_buckets: int = 64,
                     bits_per_key: int = 10) -> None:
    """Create the ``fp`` + ``bloom`` state tables -- from an existing
    corpus, or empty for a from-scratch feed."""
    if corpus is None:
        corpus = spark.createDataFrame([], f"doc_id bigint, {text_col} string")
    fps = (corpus.filter(F.col(text_col).isNotNull())
                 .select(F.md5(F.col(text_col)).alias("fp_md5")).distinct())
    write_version(fps.repartition(1), os.path.join(state_dir, "fp"))
    write_version(
        bloom_build(corpus.filter(F.col(text_col).isNotNull()),
                    text_col, n_buckets, bits_per_key).repartition(1),
        os.path.join(state_dir, "bloom"))


def stream_bloom_ingest(sdf: DataFrame, table_dir: str, state_dir: str,
                        checkpoint: str,
                        id_col: str = "doc_id", text_col: str = "text",
                        n_buckets: int = 64,
                        compact_every: int = 16,
                        query_name: str = "docs_bloom_ingest"):
    """documents stream -> exact-deduped versioned corpus + fp/bloom
    state.  Requires ``seed_bloom_state`` (empty is fine).

    Per micro-batch: probe the bloom; verify suspects against the fp
    index; dedup WITHIN the batch (min id per fingerprint -- the
    curation canonical convention); append survivors to the corpus
    and their fingerprints to the index (both txn-marked); commit the
    updated bloom.  Null-text rows are dropped (no fingerprint).

    State maintenance rides the stream: every ``compact_every``-th
    non-empty batch, the fp index's append chain is compacted into
    one snapshot (txn markers carry forward -- io/versioned, so
    exactly-once replay detection survives) and both state tables are
    vacuumed.  Without it the fp manifest grows one entry per batch
    forever and superseded bloom snapshots accumulate.  The CORPUS
    table is deliberately NOT auto-maintained -- its compaction/
    retention is the table owner's policy (time-travel horizon).

    Returns the started query; callers own awaitTermination."""
    ckpt_id = checkpoint_identity(checkpoint)
    fp_dir = os.path.join(state_dir, "fp")
    bloom_dir = os.path.join(state_dir, "bloom")

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        batch = (batch_df.filter(F.col(text_col).isNotNull())
                         .localCheckpoint())
        bloom = read_current(spark, bloom_dir).localCheckpoint()
        fp = read_current(spark, fp_dir)
        novel = bloom_new_docs_indexed(batch, fp, bloom,
                                       text_col, n_buckets)
        # batch-internal exact dups: keep the min-id row per
        # fingerprint (deterministic, replay-stable)
        w = Window.partitionBy(F.md5(F.col(text_col))) \
                  .orderBy(F.col(id_col))
        novel = (novel.withColumn("__rn", F.row_number().over(w))
                      .filter(F.col("__rn") == 1).drop("__rn")
                      .localCheckpoint())  # reused 3x below
        if novel.isEmpty():
            return  # replay of a fully-admitted batch: nothing moves
        append_version(novel, table_dir,
                       txn=f"{ckpt_id}:corpus:{batch_id}")
        append_version(
            novel.select(F.md5(F.col(text_col)).alias("fp_md5")).distinct(),
            fp_dir, txn=f"{ckpt_id}:fp:{batch_id}")
        write_version(
            bloom_update(bloom, novel, text_col, n_buckets)
            .repartition(1),
            bloom_dir)
        if compact_every and batch_id % compact_every == compact_every - 1:
            compact_table(spark, fp_dir)
            vacuum(fp_dir)
            vacuum(bloom_dir)

    return (sdf.writeStream.foreachBatch(ingest)
               .option("checkpointLocation", checkpoint)
               .queryName(query_name)
               .trigger(availableNow=True)
               .start())
