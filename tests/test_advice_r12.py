"""Pinning tests for the round-12 advisor findings.

1. io/clone._commit_v1: concurrent clones to the same fresh dst must
   not corrupt each other -- the loser's cleanup used to rmtree the
   literal v_00000001 dir it shared with the winner, deleting the
   winner's committed manifest/data refs.
2. streaming/scd_stream.stream_scd2_apply: effective_col/order_col
   that coincide with the key or a tracked column must not be dropped
   before the fold.
3. sources/versioned_source: schema() and reader() must pin the SAME
   version even if a commit lands between the engine's two calls.
"""

from __future__ import annotations

import os

import pytest

from esg_decarbonization_data_integration_and_data_pipline_spark.io.clone import (
    _commit_v1,
    deep_clone,
    shallow_clone,
)
from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
    append_version,
    current_version,
    read_current,
    read_version,
)


def _mk_table(spark, td, rows):
    df = spark.createDataFrame(rows, "k bigint, v string")
    append_version(df, td)


# ---------------------------------------------------------------- 1.


def test_raced_clone_loser_keeps_winner_intact(spark, tmp_path):
    """Simulate the interleaving where BOTH cloners pass the
    fresh-dst check before either commits: the second _commit_v1 must
    fail loudly and leave the first's committed version readable
    (the old in-place write corrupted the winner's manifest and then
    rmtree'd its version dir)."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _mk_table(spark, src, [(1, "a"), (2, "b")])
    assert shallow_clone(spark, src, dst) == 1

    # the raced loser: fresh-dst was checked before the winner's
    # commit, so it proceeds straight to _commit_v1
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import _DEFAULT_BACKEND

    schema = read_current(spark, dst).schema
    with pytest.raises(ValueError, match="gained a commit"):
        _commit_v1(dst, schema, ["bogus-file.parquet"],
                   _DEFAULT_BACKEND)

    # winner's clone is untouched: manifest/schema intact, rows read
    got = sorted((r.k, r.v) for r in read_current(spark, dst).collect())
    assert got == [(1, "a"), (2, "b")]
    # and the loser's staging dir was reaped (no .stage-* leftovers)
    assert not [e for e in os.listdir(dst) if e.startswith(".stage-")]


def test_deep_clone_stages_privately(spark, tmp_path):
    """deep_clone copies through a private staging dir; the committed
    clone reads back identically and no staging leftovers remain."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _mk_table(spark, src, [(1, "a"), (2, "b"), (3, "c")])
    assert deep_clone(spark, src, dst) == 1
    got = sorted((r.k, r.v) for r in read_version(spark, dst, 1).collect())
    assert got == [(1, "a"), (2, "b"), (3, "c")]
    assert not [e for e in os.listdir(dst) if e.startswith(".stage-")]
    # fully self-contained: every manifest line resolves inside dst
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import _MANIFEST

    man = open(os.path.join(dst, "v_00000001", _MANIFEST)).read()
    assert ".." not in man


# ---------------------------------------------------------------- 2.


def test_stream_scd2_tracked_effective_col_survives(spark, tmp_path):
    """effective_col that IS a tracked attribute (event-time stamping
    of a tracked timestamp) must stay in the dimension -- the old
    unconditional drop failed the fold with a missing-column error."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.streaming.scd_stream import (
        stream_scd2_apply,
    )

    src, td, ck = (str(tmp_path / "src"), str(tmp_path / "t"),
                   str(tmp_path / "ck"))
    schema = "k bigint, seg string, ts bigint"
    (spark.createDataFrame([(1, "A", 10), (2, "B", 11)], schema)
          .coalesce(1).write.mode("overwrite")
          .parquet(os.path.join(src, "b0")))
    sdf = spark.readStream.schema(schema).parquet(src + "/*")
    q = stream_scd2_apply(sdf, td, "k", ["seg", "ts"], ck,
                          effective_col="ts")
    q.awaitTermination()
    rows = sorted((r.k, r.seg, r.ts, r.valid_from)
                  for r in read_current(spark, td).collect())
    # ts is both a dimension attribute AND the effective stamp
    assert rows == [(1, "A", 10, 11), (2, "B", 11, 11)]


def test_stream_scd2_passthrough_marker_still_dropped(spark, tmp_path):
    """A passthrough column named as order_col is consumed as the
    marker and excluded from the dimension (documented contract)."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.streaming.scd_stream import (
        stream_scd2_apply,
    )

    src, td, ck = (str(tmp_path / "src"), str(tmp_path / "t"),
                   str(tmp_path / "ck"))
    schema = "k bigint, seg string, ts bigint"
    (spark.createDataFrame([(1, "A", 5), (1, "A2", 9)], schema)
          .coalesce(1).write.mode("overwrite")
          .parquet(os.path.join(src, "b0")))
    sdf = spark.readStream.schema(schema).parquet(src + "/*")
    q = stream_scd2_apply(sdf, td, "k", ["seg"], ck, order_col="ts")
    q.awaitTermination()
    cur = read_current(spark, td)
    assert "ts" not in cur.columns
    assert [r.seg for r in cur.filter("is_current").collect()] == ["A2"]


# ---------------------------------------------------------------- 3.


def test_datasource_schema_and_reader_pin_same_version(spark, tmp_path):
    """A commit landing between schema() and reader() must not split
    the pinned version: both resolve through _resolve_version once."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.sources.versioned_source import (
        VersionedTableDataSource,
    )

    td = str(tmp_path / "t")
    _mk_table(spark, td, [(1, "a")])
    ds = VersionedTableDataSource({"path": td})
    st = ds.schema()
    assert st is not None
    # a commit lands between the engine's schema() and reader() calls
    append_version(spark.createDataFrame([(2, "b")], "k bigint, v string"),
                   td)
    assert current_version(td) == 2
    reader = ds.reader(st)
    assert reader.n == 1  # pinned at schema() time, not re-resolved
    # a FRESH read (new DataSource instance) sees the new version
    ds2 = VersionedTableDataSource({"path": td})
    ds2.schema()
    assert ds2.reader(st).n == 2
