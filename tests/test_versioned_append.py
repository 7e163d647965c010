"""Manifest-append versioned commits (io/versioned.append_version):
O(batch) appends by reference, txn idempotence, renumbering under
contention, vacuum's reference pinning, snapshot compaction, and the
streaming sink's exactly-once replay."""

from __future__ import annotations

import os

import pytest

from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
    _MANIFEST, append_version, current_version, read_current, vacuum,
    write_version,
)


def _df(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "x bigint")


def _xs(spark, t, **kw):
    return sorted(r.x for r in read_current(spark, t, **kw).collect())


def test_append_accumulates_without_rewriting(spark, tmp_path):
    t = str(tmp_path / "t")
    assert append_version(_df(spark, [1, 2]), t) == 1
    assert append_version(_df(spark, [3]), t) == 2
    assert _xs(spark, t) == [1, 2, 3]
    # v_2 holds ONLY the new batch's files; v_1's data is inherited
    # by reference through the manifest, never copied
    v1 = {f for f in os.listdir(os.path.join(t, "v_00000001"))
          if not f.startswith(("_", "."))}
    mf = open(os.path.join(t, "v_00000002", _MANIFEST)).read()
    for f in v1:
        assert f"v_00000001/{f}" in mf


def test_append_inherits_from_a_snapshot_base(spark, tmp_path):
    """write_version (snapshot, no manifest) and append_version
    compose: the append's manifest lists the snapshot dir's files."""
    t = str(tmp_path / "t")
    assert write_version(_df(spark, [1, 2]), t) == 1
    assert append_version(_df(spark, [3]), t) == 2
    assert _xs(spark, t) == [1, 2, 3]


def test_snapshot_terminates_the_chain_and_vacuum_reaps(spark, tmp_path):
    """Compaction: snapshotting read_current breaks the reference
    chain, so once retention passes vacuum reaps the append dirs --
    and the compacted data survives."""
    import time

    t = str(tmp_path / "t")
    append_version(_df(spark, [1]), t)
    append_version(_df(spark, [2]), t)
    n = write_version(read_current(spark, t), t)  # compaction
    assert n == 3
    old = time.time() - 10
    for v in ("v_00000001", "v_00000002"):
        os.utime(os.path.join(t, v), (old, old))
    removed = vacuum(t, keep_last=1, stage_ttl_seconds=5)
    assert removed == [1, 2]
    assert _xs(spark, t) == [1, 2]


def test_vacuum_pins_dirs_referenced_by_kept_manifests(spark, tmp_path):
    """An old version dir referenced by the CURRENT manifest must
    survive vacuum even when it falls outside keep_last -- reaping it
    would dangle the current version."""
    import time

    t = str(tmp_path / "t")
    append_version(_df(spark, [1]), t)
    append_version(_df(spark, [2]), t)
    append_version(_df(spark, [3]), t)
    old = time.time() - 10
    for v in os.listdir(t):
        if v.startswith("v_"):
            os.utime(os.path.join(t, v), (old, old))
    assert vacuum(t, keep_last=1, stage_ttl_seconds=5) == []
    assert _xs(spark, t) == [1, 2, 3]


def test_txn_replay_is_exactly_once(spark, tmp_path):
    t = str(tmp_path / "t")
    assert append_version(_df(spark, [1]), t, txn="b:0") == 1
    # crash-rerun of the same micro-batch: same txn, same data
    assert append_version(_df(spark, [1]), t, txn="b:0") == 1
    assert current_version(t) == 1
    assert _xs(spark, t) == [1]
    # the marker inherits forward: a replay AFTER later appends still
    # answers with the current version instead of double-appending
    assert append_version(_df(spark, [2]), t, txn="b:1") == 2
    assert append_version(_df(spark, [1]), t, txn="b:0") == 2
    assert _xs(spark, t) == [1, 2]


def test_empty_batch_append_is_readable(spark, tmp_path):
    t = str(tmp_path / "t")
    append_version(_df(spark, []), t)
    assert read_current(spark, t).count() == 0
    assert read_current(spark, t).schema.simpleString() == \
        "struct<x:bigint>"
    append_version(_df(spark, [7]), t)
    assert _xs(spark, t) == [7]


def test_append_renumbers_over_a_concurrent_commit(spark, tmp_path):
    """A competitor committing inside our read-to-commit window must
    not raise (append semantics: nothing is invalidated) -- the claim
    renumbers above the new base, the manifest is rebuilt, and BOTH
    writes are visible."""
    import threading

    from tests.test_versioned import _FakeObjectStore

    store = _FakeObjectStore()
    t = str(tmp_path / "t")
    assert append_version(_df(spark, [1]), t, backend=store) == 1

    lock = threading.Lock()

    def interloper():
        # a competitor full append lands between our pointer read and
        # our conditional put (run on the SAME backend, no interloper
        # recursion: the list was already drained)
        with lock:
            append_version(_df(spark, [99]), t, backend=store)

    store.interlopers.append(interloper)
    n = append_version(_df(spark, [2]), t, backend=store)
    # our claim held v_2, so the interloper claimed v_3 and committed
    # it; renumbering moves our dir above BOTH (numbers need not be
    # dense -- v_2 is left vacant)
    assert n == 4
    assert current_version(t, backend=store) == 4
    assert store.precondition_failures >= 1
    assert _xs(spark, t, backend=store) == [1, 2, 99]


def test_reader_snapshot_survives_append_and_compaction(spark, tmp_path):
    t = str(tmp_path / "t")
    append_version(_df(spark, [1]), t)
    held = read_current(spark, t)  # resolves v_1 now
    append_version(_df(spark, [2]), t)
    write_version(read_current(spark, t), t)
    assert sorted(r.x for r in held.collect()) == [1]
    assert _xs(spark, t) == [1, 2]


SCHEMA = "doc_id bigint, text string"


def _write_batch(spark, src, rows, name):
    (spark.createDataFrame(rows, SCHEMA)
          .coalesce(1).write.mode("overwrite")
          .parquet(os.path.join(src, name)))


def _run_stream(spark, src, t, ckpt, transform=None):
    from esg_decarbonization_data_integration_and_data_pipline_spark.streaming.docs_versioned import (
        stream_versioned_append,
    )

    sdf = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", "1").parquet(src + "/*")
    q = stream_versioned_append(sdf, t, ckpt, transform=transform)
    q.awaitTermination()


def test_stream_appends_one_version_per_batch(spark, tmp_path):
    src, t = str(tmp_path / "src"), str(tmp_path / "t")
    _write_batch(spark, src, [(1, "a"), (2, "b")], "b0")
    _write_batch(spark, src, [(3, "c")], "b1")
    _run_stream(spark, src, t, str(tmp_path / "ck"))
    assert current_version(t) == 2  # one version per 1-file trigger
    got = sorted(r.doc_id for r in read_current(spark, t).collect())
    assert got == [1, 2, 3]


def test_stream_restart_does_not_reappend(spark, tmp_path):
    """Restarting from the same checkpoint with no new data commits
    nothing; new data appends exactly its own batch."""
    src, t, ck = (str(tmp_path / "src"), str(tmp_path / "t"),
                  str(tmp_path / "ck"))
    _write_batch(spark, src, [(1, "a")], "b0")
    _run_stream(spark, src, t, ck)
    v_after_first = current_version(t)
    _run_stream(spark, src, t, ck)  # replay: no new files
    assert current_version(t) == v_after_first
    _write_batch(spark, src, [(2, "b")], "b1")
    _run_stream(spark, src, t, ck)
    got = sorted(r.doc_id for r in read_current(spark, t).collect())
    assert got == [1, 2]


def test_stream_sink_crash_replay_is_exactly_once(spark, tmp_path):
    """Direct sink-level replay: committing the same (checkpoint,
    batch_id) twice -- Structured Streaming's crash-between-commit-
    and-checkpoint case -- lands exactly one version."""
    import hashlib

    from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
        append_version as _append,
    )

    t = str(tmp_path / "t")
    ckpt_id = hashlib.md5(b"ck").hexdigest()[:12]
    b = spark.createDataFrame([(1, "a")], SCHEMA)
    assert _append(b, t, txn=f"{ckpt_id}:0") == 1
    assert _append(b, t, txn=f"{ckpt_id}:0") == 1
    assert read_current(spark, t).count() == 1


def test_stream_transform_applies_before_append(spark, tmp_path):
    from pyspark.sql import functions as F

    src, t = str(tmp_path / "src"), str(tmp_path / "t")
    _write_batch(spark, src, [(1, "keep"), (2, None)], "b0")
    _run_stream(spark, src, t, str(tmp_path / "ck"),
                transform=lambda d: d.filter(F.col("text").isNotNull()))
    got = [r.doc_id for r in read_current(spark, t).collect()]
    assert got == [1]


def test_stream_auto_compact_bounds_file_count(spark, tmp_path):
    """auto_compact_files keeps a long append chain's read-side file
    count bounded: each 1-file trigger appends its own files, and the
    batch ends with maybe_compact(threshold) -- the chain never
    exceeds threshold+batch files, data stays exact, and the carried
    txn markers still refuse a replay after compaction."""
    import shutil

    from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import _data_files
    from esg_decarbonization_data_integration_and_data_pipline_spark.streaming.docs_versioned import (
        stream_versioned_append,
    )

    src, t, ck = (str(tmp_path / "src"), str(tmp_path / "t"),
                  str(tmp_path / "ck"))
    for i in range(6):
        _write_batch(spark, src, [(i, f"d{i}")], f"b{i}")

    def run():
        sdf = spark.readStream.schema(SCHEMA).option(
            "maxFilesPerTrigger", "1").parquet(src + "/*")
        q = stream_versioned_append(sdf, t, ck, auto_compact_files=2)
        q.awaitTermination()

    run()
    n = current_version(t)
    assert len(_data_files(t, n)) <= 3  # bounded, not 6
    got = sorted(r.doc_id for r in read_current(spark, t).collect())
    assert got == list(range(6))
    # crash-replay (wiped checkpoint, same identity): every batch txn
    # refuses -- including ones whose marker now lives in a
    # compaction snapshot -- and the data does not duplicate
    shutil.rmtree(ck)
    run()
    assert sorted(r.doc_id for r in
                  read_current(spark, t).collect()) == list(range(6))
