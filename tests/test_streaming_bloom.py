"""Streaming exact-dedup ingest (streaming/docs_bloom): bloom-probed,
index-verified, versioned-committed -- admits each distinct text once
across batches, dedups within a batch by min id, and replay
converges."""

from __future__ import annotations

import os

import pytest

from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
    history, read_current,
)
from esg_decarbonization_data_integration_and_data_pipline_spark.streaming.docs_bloom import (
    seed_bloom_state, stream_bloom_ingest,
)

SCHEMA = "doc_id bigint, text string"
D1 = [(1, "alpha beta gamma"),
      (2, "delta epsilon zeta"),
      (3, "alpha beta gamma"),      # exact dup of 1 (within batch)
      (4, None)]                    # null text: dropped
D2 = [(10, "delta epsilon zeta"),   # exact dup of 2 (cross batch)
      (11, "fresh new content"),
      (12, "eta theta iota")]


def _write_batch(spark, src, rows, name):
    (spark.createDataFrame(rows, SCHEMA)
          .coalesce(1).write.mode("overwrite")
          .parquet(os.path.join(src, name)))


def _run(spark, src, corpus, state, ckpt):
    sdf = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", "1").parquet(src + "/*")
    q = stream_bloom_ingest(sdf, corpus, state, ckpt, n_buckets=8)
    q.awaitTermination()


def test_stream_bloom_ingest_and_replay(spark, tmp_path):
    src = str(tmp_path / "src")
    corpus = str(tmp_path / "corpus")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    seed_bloom_state(spark, state, n_buckets=8)

    _write_batch(spark, src, D1, "b1")
    _run(spark, src, corpus, state, ckpt)
    got1 = {r.doc_id for r in read_current(spark, corpus).collect()}
    assert got1 == {1, 2}  # 3 = within-batch dup, 4 = null text

    _write_batch(spark, src, D2, "b2")
    _run(spark, src, corpus, state, ckpt)
    got2 = {r.doc_id for r in read_current(spark, corpus).collect()}
    assert got2 == {1, 2, 11, 12}  # 10 = cross-batch exact dup

    # snapshot isolation surface: each non-empty batch is one
    # committed corpus version (the first classifies as "snapshot" --
    # an append into an empty table inherits nothing), and the fp
    # index matches the corpus
    assert [h["version"] for h in history(corpus)] == [1, 2]
    fps = {r.fp_md5 for r in
           read_current(spark, os.path.join(state, "fp")).collect()}
    assert len(fps) == 4

    # replay convergence: same checkpoint, no new files
    _run(spark, src, corpus, state, ckpt)
    assert {r.doc_id for r in read_current(spark, corpus).collect()} == got2


def test_state_maintenance_compacts_and_keeps_txn_markers(spark, tmp_path):
    """With compact_every=1 the fp chain compacts each batch; the
    carried txn set must still refuse a replayed append (exactly-once
    survives compaction), and vacuum keeps the state readable."""
    import hashlib

    from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
        append_version, current_version,
    )

    src = str(tmp_path / "src")
    corpus = str(tmp_path / "corpus")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    seed_bloom_state(spark, state, n_buckets=8)

    _write_batch(spark, src, D1, "b1")
    sdf = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", "1").parquet(src + "/*")
    q = stream_bloom_ingest(sdf, corpus, state, ckpt, n_buckets=8,
                            compact_every=1)
    q.awaitTermination()
    fp_dir = os.path.join(state, "fp")
    fps = {r.fp_md5 for r in read_current(spark, fp_dir).collect()}
    assert len(fps) == 2
    # the compacted snapshot still carries the batch's txn marker: a
    # replayed fp append is answered with the current version
    ckpt_id = hashlib.md5(ckpt.encode()).hexdigest()[:12]
    cur = current_version(fp_dir)
    replay = spark.createDataFrame([("deadbeef",)], "fp_md5 string")
    assert append_version(replay, fp_dir,
                          txn=f"{ckpt_id}:fp:0") == cur
    assert {r.fp_md5 for r in read_current(spark, fp_dir).collect()} == fps


def test_seeded_corpus_blocks_known_texts(spark, tmp_path):
    src = str(tmp_path / "src")
    corpus = str(tmp_path / "corpus")
    state = str(tmp_path / "state")
    os.makedirs(src)
    seeded = spark.createDataFrame(
        [(100, "alpha beta gamma"), (101, "known text two")], SCHEMA)
    seed_bloom_state(spark, state, corpus=seeded, n_buckets=8)

    _write_batch(spark, src, D1, "b1")
    _run(spark, src, corpus, state, str(tmp_path / "ckpt"))
    got = {r.doc_id for r in read_current(spark, corpus).collect()}
    assert got == {2}  # 1/3 known from the seed corpus, 4 null


def test_crash_between_corpus_and_state_converges(spark, tmp_path):
    """The documented worst crash point: corpus append committed,
    fp/bloom state never updated, checkpoint not advanced -- the
    replayed batch must not double-admit (the corpus txn marker
    refuses it) and the state must catch up."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
        append_version,
    )
    import hashlib

    corpus = str(tmp_path / "corpus")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    seed_bloom_state(spark, state, n_buckets=8)
    # simulate the half-done batch 0: corpus append landed with the
    # txn marker the stream will use, state untouched
    ckpt_id = hashlib.md5(ckpt.encode()).hexdigest()[:12]
    pre = spark.createDataFrame([(1, "alpha beta gamma"),
                                 (2, "delta epsilon zeta")], SCHEMA)
    append_version(pre, corpus, txn=f"{ckpt_id}:corpus:0")

    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_batch(spark, src, D1, "b1")  # the same batch, replayed
    _run(spark, src, corpus, state, ckpt)
    got = {r.doc_id for r in read_current(spark, corpus).collect()}
    assert got == {1, 2}  # no double-admit
    assert len(history(corpus)) == 1  # replayed append returned v1
    fps = {r.fp_md5 for r in
           read_current(spark, os.path.join(state, "fp")).collect()}
    assert len(fps) == 2  # state caught up
