"""Table cloning (io/clone): zero-copy shallow clones, physical deep
clones, independent divergence, and the purge safety guard for
externally-referenced files."""

from __future__ import annotations

import os
import shutil

import pytest

from esg_decarbonization_data_integration_and_data_pipline_spark.io.clone import (
    deep_clone,
    shallow_clone,
)
from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
    _data_files,
    append_version,
    committed_versions,
    current_version,
    delete_keys_version,
    merge_version,
    read_current,
    read_version,
    table_rowcount,
    vacuum,
)


def _kv(spark, pairs):
    return spark.createDataFrame(pairs, "k bigint, amt double")


def _rows(spark, td, n=None):
    df = read_current(spark, td) if n is None else read_version(
        spark, td, n)
    return sorted((r.k, r.amt) for r in df.collect())


def _build_src(spark, tmp_path, name="src"):
    src = str(tmp_path / name)
    append_version(_kv(spark, [(1, 1.0), (2, 2.0)]).coalesce(1), src,
                   txn="load:1", stats_columns=["k"])
    append_version(_kv(spark, [(3, 3.0)]).coalesce(1), src,
                   txn="load:2")
    return src


def test_shallow_clone_reads_equal_source(spark, tmp_path):
    src = _build_src(spark, tmp_path)
    dst = str(tmp_path / "dst")
    assert shallow_clone(spark, src, dst) == 1
    assert _rows(spark, dst) == _rows(spark, src)
    # zero bytes copied: the clone's v1 holds no parquet of its own
    own = [f for f in os.listdir(os.path.join(dst, "v_00000001"))
           if f.endswith(".parquet")]
    assert own == []
    # metadata rode along: rowcount answers without a scan
    assert table_rowcount(dst, 1) == 3
    # txn markers carried: a replayed load is still deduped
    append_version(_kv(spark, [(9, 9.0)]), dst, txn="load:2")
    assert current_version(dst) == 1


def test_shallow_clone_of_historical_version(spark, tmp_path):
    src = _build_src(spark, tmp_path)
    dst = str(tmp_path / "dst")
    shallow_clone(spark, src, dst, n=1)
    assert _rows(spark, dst) == [(1, 1.0), (2, 2.0)]


def test_divergence_is_independent_both_ways(spark, tmp_path):
    src = _build_src(spark, tmp_path)
    dst = str(tmp_path / "dst")
    shallow_clone(spark, src, dst)
    src_files = {f: os.path.getmtime(os.path.join(src, f))
                 for f in _data_files(src, 2)}
    # clone diverges: COW delete + upsert write into the CLONE only
    delete_keys_version(spark, dst,
                        spark.createDataFrame([(1,)], "k bigint"), "k")
    merge_version(spark, dst, _kv(spark, [(2, 99.0)]), "k")
    assert _rows(spark, dst) == [(2, 99.0), (3, 3.0)]
    assert _rows(spark, src) == [(1, 1.0), (2, 2.0), (3, 3.0)]
    # the source bytes were never touched
    assert {f: os.path.getmtime(os.path.join(src, f))
            for f in _data_files(src, 2)} == src_files
    # and the source diverges without affecting the clone
    append_version(_kv(spark, [(7, 7.0)]), src)
    assert _rows(spark, dst) == [(2, 99.0), (3, 3.0)]


def test_clone_vacuum_never_touches_source(spark, tmp_path):
    src = _build_src(spark, tmp_path)
    dst = str(tmp_path / "dst")
    shallow_clone(spark, src, dst)
    for i in range(3):
        append_version(_kv(spark, [(10 + i, 1.0)]), dst)
    vacuum(dst, keep_last=1, stage_ttl_seconds=0)
    assert _rows(spark, src) == [(1, 1.0), (2, 2.0), (3, 3.0)]
    assert _rows(spark, dst, current_version(dst))[-1] == (12, 1.0)


def test_deep_clone_survives_source_deletion(spark, tmp_path):
    src = _build_src(spark, tmp_path)
    dst = str(tmp_path / "dst")
    assert deep_clone(spark, src, dst) == 1
    expect = _rows(spark, src)
    shutil.rmtree(src)
    assert _rows(spark, dst) == expect
    assert table_rowcount(dst, 1) == 3
    # fully mutable on its own
    merge_version(spark, dst, _kv(spark, [(1, -1.0)]), "k")
    assert _rows(spark, dst)[0] == (1, -1.0)


def test_purge_refuses_shallow_but_allows_deep(spark, tmp_path):
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.purge import (
        ExternalFilesError, purge_keys_history,
    )

    src = _build_src(spark, tmp_path)
    shallow = str(tmp_path / "shallow")
    deep = str(tmp_path / "deep")
    shallow_clone(spark, src, shallow)
    deep_clone(spark, src, deep)
    with pytest.raises(ExternalFilesError, match="deep_clone first"):
        purge_keys_history(spark, shallow, "k", [2])
    # the refusal left the clone fully readable and the source intact
    assert _rows(spark, shallow) == [(1, 1.0), (2, 2.0), (3, 3.0)]
    assert purge_keys_history(spark, deep, "k", [2])["rows_purged"] == 1
    assert _rows(spark, deep) == [(1, 1.0), (3, 3.0)]
    assert _rows(spark, src) == [(1, 1.0), (2, 2.0), (3, 3.0)]


def test_clone_carries_constraints(spark, tmp_path):
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.constraints import (
        set_table_constraints, table_constraints,
    )
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.expectations import (
        CheckFailedError, in_range,
    )

    src = _build_src(spark, tmp_path)
    set_table_constraints(spark, src, [in_range("amt", lo=0.0)])
    dst = str(tmp_path / "dst")
    shallow_clone(spark, src, dst)
    assert [c.label for c in table_constraints(dst)] == \
        ["in_range:amt"]
    with pytest.raises(CheckFailedError):
        append_version(_kv(spark, [(9, -9.0)]), dst)


def test_clone_point_lookup_uses_source_sidecars(spark, tmp_path):
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.bloom_index import (
        build_bloom_index, lookup_files, point_lookup,
    )

    src = _build_src(spark, tmp_path)
    build_bloom_index(spark, src, "k")
    dst = str(tmp_path / "dst")
    shallow_clone(spark, src, dst)
    # bloom pruning works through the clone's external references:
    # a value outside every file's keys prunes everything, a real
    # key reads only its file
    assert lookup_files(dst, "k", 999_999) == []
    got = point_lookup(spark, dst, "k", 3).collect()
    assert [(r.k, r.amt) for r in got] == [(3, 3.0)]


def test_clone_target_must_be_fresh_and_distinct(spark, tmp_path):
    src = _build_src(spark, tmp_path)
    with pytest.raises(ValueError, match="onto itself"):
        shallow_clone(spark, src, src)
    dst = str(tmp_path / "dst")
    append_version(_kv(spark, [(1, 1.0)]), dst)
    with pytest.raises(ValueError, match="fresh"):
        shallow_clone(spark, src, dst)
    with pytest.raises(ValueError, match="fresh"):
        deep_clone(spark, src, dst)
    with pytest.raises(ValueError, match="not readable"):
        shallow_clone(spark, src, str(tmp_path / "dst2"), n=9)


def test_chained_shallow_clones(spark, tmp_path):
    """A clone of a clone resolves through both reference hops."""
    src = _build_src(spark, tmp_path)
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    shallow_clone(spark, src, a)
    append_version(_kv(spark, [(4, 4.0)]), a)
    shallow_clone(spark, a, b)
    assert _rows(spark, b) == [(1, 1.0), (2, 2.0), (3, 3.0), (4, 4.0)]
