"""Zero-copy RESTORE (io/versioned.restore_table): current rolls back
to an earlier committed state by reference -- history stays
time-travelable, txn markers revert so rolled-back streaming batches
redeliver, and nothing is read or rewritten."""

from __future__ import annotations

import os

import pytest

from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
    VersionConflictError,
    _data_files,
    _txns,
    append_version,
    current_version,
    history,
    merge_version,
    read_current,
    read_version,
    restore_table,
    table_rowcount,
    table_schema,
    vacuum,
)


def _kv(spark, pairs):
    return spark.createDataFrame(pairs, "k bigint, a string")


def _rows(df):
    return sorted((r.k, r.a) for r in df.collect())


def test_restore_rolls_back_by_reference(spark, tmp_path):
    t = str(tmp_path / "t")
    append_version(_kv(spark, [(1, "a")]).coalesce(1), t, txn="b1",
                   stats_columns=["k"])
    append_version(_kv(spark, [(2, "BAD")]).coalesce(1), t, txn="b2")
    merge_version(spark, t, _kv(spark, [(1, "WORSE")]), "k")
    n = restore_table(spark, t, 1)
    assert n == 4 == current_version(t)
    assert _rows(read_current(spark, t)) == [(1, "a")]
    # same physical files as v1 -- zero copy
    assert _data_files(t, 4) == _data_files(t, 1)
    # history intact: the bad versions stay readable for forensics
    assert [h["version"] for h in history(t)] == [1, 2, 3, 4]
    assert _rows(read_version(spark, t, 3)) == [(1, "WORSE"),
                                                (2, "BAD")]
    # metadata counts answer for the restored state
    assert table_rowcount(t, 4) == 1


def test_restore_reverts_txn_markers_for_redelivery(spark, tmp_path):
    t = str(tmp_path / "t")
    append_version(_kv(spark, [(1, "a")]), t, txn="batch-1")
    append_version(_kv(spark, [(2, "b")]), t, txn="batch-2")
    restore_table(spark, t, 1)
    assert "batch-2" not in _txns(t, current_version(t))
    # the rolled-back batch REDELIVERS (not treated as a replay)
    append_version(_kv(spark, [(2, "b-fixed")]), t, txn="batch-2")
    assert _rows(read_current(spark, t)) == [(1, "a"),
                                             (2, "b-fixed")]


def test_restore_validations_and_noop(spark, tmp_path):
    t = str(tmp_path / "t")
    append_version(_kv(spark, [(1, "a")]), t)
    assert restore_table(spark, t, 1) == 1  # already there: no-op
    with pytest.raises(ValueError, match="never committed"):
        restore_table(spark, t, 9)
    with pytest.raises(FileNotFoundError):
        restore_table(spark, str(tmp_path / "missing"), 1)


def test_restore_refuses_vacuumed_target(spark, tmp_path):
    t = str(tmp_path / "t")
    for i in range(4):
        append_version(_kv(spark, [(i, f"a{i}")]), t)
    import shutil

    # simulate retention having reaped v1's dir (and nothing
    # referencing it anymore would be true post-compaction; here we
    # only need the dir gone for the refusal path)
    v1 = os.path.join(t, "v_00000001")
    shutil.rmtree(v1)
    with pytest.raises(ValueError, match="vacuumed"):
        restore_table(spark, t, 1)


def test_restored_version_survives_vacuum(spark, tmp_path):
    t = str(tmp_path / "t")
    append_version(_kv(spark, [(1, "a")]).coalesce(1), t)
    for i in range(2, 5):
        append_version(_kv(spark, [(i, f"a{i}")]).coalesce(1), t)
    restore_table(spark, t, 1)
    # age everything; retention keeps the restore and, via its
    # manifest references, v1's dir that physically holds the data
    for d in os.listdir(t):
        if d.startswith("v_"):
            os.utime(os.path.join(t, d), (0, 0))
    vacuum(t, keep_last=1, stage_ttl_seconds=0.0)
    assert _rows(read_current(spark, t)) == [(1, "a")]


def test_restore_across_schema_evolution(spark, tmp_path):
    t = str(tmp_path / "t")
    append_version(_kv(spark, [(1, "a")]), t)
    wide = spark.createDataFrame([(2, "b", 9.9)],
                                 "k bigint, a string, x double")
    append_version(wide, t, merge_schema=True)
    restore_table(spark, t, 1)
    cur = current_version(t)
    # the restored state carries v1's NARROW schema
    assert table_schema(t, cur).fieldNames() == ["k", "a"]
    assert read_current(spark, t).columns == ["k", "a"]


def test_concurrent_commit_mid_restore_raises(spark, tmp_path,
                                              monkeypatch):
    from esg_decarbonization_data_integration_and_data_pipline_spark.io import versioned as V

    t = str(tmp_path / "t")
    append_version(_kv(spark, [(1, "a")]), t)
    append_version(_kv(spark, [(2, "b")]), t)
    real = V._write_schema_file
    fired = {"done": False}

    def interleave(dir_path, schema):
        if not fired["done"] and f"{os.sep}v_0000" in dir_path:
            fired["done"] = True
            append_version(_kv(spark, [(3, "c")]), t)
        return real(dir_path, schema)

    monkeypatch.setattr(V, "_write_schema_file", interleave)
    with pytest.raises(VersionConflictError):
        restore_table(spark, t, 1)
    monkeypatch.setattr(V, "_write_schema_file", real)
    # the interloper's append survives; a re-run restores cleanly
    restore_table(spark, t, 1)
    assert _rows(read_current(spark, t)) == [(1, "a")]
