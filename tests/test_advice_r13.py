"""Pins for the r12 ADVICE findings fixed in round 13.

- purge.py:447 crash window -> tests/test_purge.py::
  test_reader_heals_pending_dv_remap_journal
- purge.py:141 rebound key -> tests/test_purge.py::
  test_purge_rebound_logical_key_raises
- versioned.py:1018 suffix collision + clone.py:46 stale clone #dv
  counts -> here.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
    _dv_suffix_map,
    append_version,
    delete_keys_dv,
    table_rowcount,
)


def test_dv_suffix_map_rejects_collision():
    """A clone-local file and a shallow clone's ../-external ref
    sharing the trailing v_N/<basename> must fail loudly, not join
    deletion masks onto the wrong rows."""
    ok = _dv_suffix_map(["v_00000001/part-a.parquet",
                         "v_00000002/part-a.parquet"])
    assert len(ok) == 2
    with pytest.raises(RuntimeError, match="collision"):
        _dv_suffix_map(["v_00000001/part-a.parquet",
                        "../src/v_00000001/part-a.parquet"])
    # identical references are not a collision (idempotent listing)
    assert len(_dv_suffix_map(["v_00000001/p.parquet",
                               "v_00000001/p.parquet"])) == 1


def test_shallow_clone_rowcount_survives_source_purge(spark,
                                                     tmp_path):
    """clone.py caveat hardened: a purge on the SOURCE remaps the
    shared dv sidecars in place and fixes only the source manifests;
    the clone's metadata rowcount must cross-check the sidecar's
    rowcount witness instead of silently returning stale numbers."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.clone import shallow_clone
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.purge import purge_keys_history

    src = str(tmp_path / "src")
    cl = str(tmp_path / "cl")
    df = spark.createDataFrame(
        [(k, f"a{k}") for k in range(10)], "k bigint, a string")
    append_version(df.coalesce(1), src, stats_columns=["k"])
    # dv-delete key 3: v2 carries a position sidecar on the file
    delete_keys_dv(spark, src,
                   spark.createDataFrame([(3,)], "k bigint"), "k")
    shallow_clone(spark, src, cl, n=2)
    assert table_rowcount(cl, 1) == 9
    # purge key 1 on the SOURCE: the shared file is rewritten and the
    # shared sidecar remapped in place; only source manifests fixed
    purge_keys_history(spark, src, "k", [1])
    assert table_rowcount(src, 2) == 8
    # the clone's manifest still records the OLD physical count and
    # OLD deleted count -- the witness cross-check must correct both
    assert table_rowcount(cl, 1) == 8
    # the clone still reads correctly (positions decode fresh)
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import read_version
    got = sorted(r.k for r in read_version(spark, cl, 1).collect())
    assert got == [0, 2, 4, 5, 6, 7, 8, 9]
