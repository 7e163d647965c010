"""Incrementally-maintained aggregate materialized views
(io/matview): create-from-current, O(delta) refresh via the
change-data-feed, drained-group deletion, exactly-once refresh
replay, min/max-under-delete refusal + full_refresh fallback, and
value parity with a from-scratch GROUP BY at every step."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from esg_decarbonization_data_integration_and_data_pipline_spark.io.matview import (
    MinMaxDeleteError,
    create_aggregate_view,
    full_refresh_aggregate_view,
    last_source_version,
    read_aggregate_view,
    refresh_aggregate_view,
)
from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
    append_version,
    compact_table,
    current_version,
    delete_keys_version,
    history,
    merge_version,
)

MEASURES = [
    {"name": "n", "agg": "count"},
    {"name": "total", "agg": "sum", "col": "x"},
    {"name": "mean", "agg": "avg", "col": "x"},
]


def _src(spark, rows):
    return spark.createDataFrame(rows, "k bigint, g string, x double")


def _expected(spark, src_rows):
    return sorted(
        (r.g, r.n, r.total, r.mean)
        for r in _src(spark, src_rows)
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("total"),
             F.avg("x").alias("mean"))
        .collect())


def _got(spark, mv):
    return sorted((r.g, r.n, r.total, r.mean)
                  for r in read_aggregate_view(spark, mv).collect())


def test_create_matches_group_by(spark, tmp_path):
    src, mv = str(tmp_path / "s"), str(tmp_path / "m")
    rows = [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 10.0)]
    append_version(_src(spark, rows), src, stats_columns=["k"])
    create_aggregate_view(spark, src, mv, ["g"], MEASURES)
    assert _got(spark, mv) == _expected(spark, rows)
    assert last_source_version(mv) == 1


def test_refresh_append_only_delta(spark, tmp_path):
    src, mv = str(tmp_path / "s"), str(tmp_path / "m")
    r1 = [(1, "a", 1.0), (2, "b", 4.0)]
    append_version(_src(spark, r1), src, stats_columns=["k"])
    create_aggregate_view(spark, src, mv, ["g"], MEASURES)
    r2 = [(3, "a", 5.0), (4, "c", 7.0)]  # existing group + new group
    append_version(_src(spark, r2), src)
    v, frm, to = refresh_aggregate_view(spark, mv)
    assert (frm, to) == (1, 2)
    assert _got(spark, mv) == _expected(spark, r1 + r2)
    # already current: no commit, from == to
    v2, frm2, to2 = refresh_aggregate_view(spark, mv)
    assert frm2 == to2 == 2 and v2 == current_version(mv)


def test_refresh_with_deletes_and_drained_group(spark, tmp_path):
    src, mv = str(tmp_path / "s"), str(tmp_path / "m")
    r1 = [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 10.0), (4, "c", 5.0)]
    append_version(_src(spark, r1).coalesce(1), src,
                   stats_columns=["k"])
    create_aggregate_view(spark, src, mv, ["g"], MEASURES)
    # delete ALL of group b (drains it) and one row of group a
    delete_keys_version(
        spark, src, spark.createDataFrame([(2,), (3,)], "k bigint"),
        "k")
    refresh_aggregate_view(spark, mv)
    survivors = [(1, "a", 1.0), (4, "c", 5.0)]
    assert _got(spark, mv) == _expected(spark, survivors)
    # the drained group's row is GONE, not a zero-count husk
    assert read_aggregate_view(spark, mv).filter(
        F.col("g") == "b").count() == 0


def test_refresh_after_update_merge(spark, tmp_path):
    src, mv = str(tmp_path / "s"), str(tmp_path / "m")
    r1 = [(1, "a", 1.0), (2, "b", 4.0)]
    append_version(_src(spark, r1).coalesce(1), src,
                   stats_columns=["k"])
    create_aggregate_view(spark, src, mv, ["g"], MEASURES)
    # an update surfaces in the CDF as delete+insert; the fold must
    # net them (row moves group a -> b with a new value)
    merge_version(spark, src, _src(spark, [(1, "b", 9.0)]), "k")
    refresh_aggregate_view(spark, mv)
    assert _got(spark, mv) == _expected(spark,
                                        [(1, "b", 9.0), (2, "b", 4.0)])


def test_refresh_exactly_once_replay(spark, tmp_path):
    src, mv = str(tmp_path / "s"), str(tmp_path / "m")
    append_version(_src(spark, [(1, "a", 1.0)]), src,
                   stats_columns=["k"])
    create_aggregate_view(spark, src, mv, ["g"], MEASURES)
    append_version(_src(spark, [(2, "a", 3.0)]), src)
    v, _, to = refresh_aggregate_view(spark, mv)
    # a crash-rerun of the SAME refresh (same source target version)
    # must be a txn replay: same mv version back, accumulators not
    # double-folded
    vb = merge_version(
        spark, mv,
        read_aggregate_view(spark, mv).limit(0)
        .withColumn("__mv_key", F.lit("x")).select("__mv_key"),
        "__mv_key", txn=f"mv-src-v{to}")
    assert vb == v
    assert _got(spark, mv) == _expected(
        spark, [(1, "a", 1.0), (2, "a", 3.0)])


def test_minmax_insert_only_and_delete_refusal(spark, tmp_path):
    src, mv = str(tmp_path / "s"), str(tmp_path / "m")
    mm = [{"name": "lo", "agg": "min", "col": "x"},
          {"name": "hi", "agg": "max", "col": "x"}]
    append_version(_src(spark, [(1, "a", 5.0), (2, "a", 2.0)])
                   .coalesce(1), src, stats_columns=["k"])
    create_aggregate_view(spark, src, mv, ["g"], mm)
    append_version(_src(spark, [(3, "a", 9.0), (4, "b", 1.0)]), src)
    refresh_aggregate_view(spark, mv)
    got = sorted((r.g, r.lo, r.hi)
                 for r in read_aggregate_view(spark, mv).collect())
    assert got == [("a", 2.0, 9.0), ("b", 1.0, 1.0)]
    # a delete may retire the stored extreme: refuse, loudly
    delete_keys_version(
        spark, src, spark.createDataFrame([(3,)], "k bigint"), "k")
    with pytest.raises(MinMaxDeleteError, match="full_refresh"):
        refresh_aggregate_view(spark, mv)
    # the documented fallback rebuilds and re-arms incremental refresh
    n, src_v = full_refresh_aggregate_view(spark, mv)
    assert last_source_version(mv) == src_v
    got = sorted((r.g, r.lo, r.hi)
                 for r in read_aggregate_view(spark, mv).collect())
    assert got == [("a", 2.0, 5.0), ("b", 1.0, 1.0)]
    append_version(_src(spark, [(9, "b", 0.5)]), src)
    refresh_aggregate_view(spark, mv)  # incremental works again
    got = sorted((r.g, r.lo, r.hi)
                 for r in read_aggregate_view(spark, mv).collect())
    assert got == [("a", 2.0, 5.0), ("b", 0.5, 1.0)]


def test_all_null_group_sums_read_null(spark, tmp_path):
    src, mv = str(tmp_path / "s"), str(tmp_path / "m")
    rows = [(1, "a", None), (2, "a", None), (3, "b", 1.0)]
    append_version(_src(spark, rows), src, stats_columns=["k"])
    create_aggregate_view(spark, src, mv, ["g"], MEASURES)
    assert _got(spark, mv) == _expected(spark, rows)  # a: (2, None, None)


def test_multi_key_and_null_key_groups(spark, tmp_path):
    src, mv = str(tmp_path / "s"), str(tmp_path / "m")
    df = spark.createDataFrame(
        [(1, "a", None, 1.0), (2, "a", "x", 2.0), (3, None, "x", 3.0)],
        "k bigint, g1 string, g2 string, x double")
    append_version(df, src, stats_columns=["k"])
    create_aggregate_view(spark, src, mv, ["g1", "g2"],
                          [{"name": "total", "agg": "sum", "col": "x"}])
    append_version(spark.createDataFrame(
        [(4, "a", None, 10.0)],
        "k bigint, g1 string, g2 string, x double"), src)
    refresh_aggregate_view(spark, mv)
    got = sorted(((r.g1, r.g2, r.total) for r in
                  read_aggregate_view(spark, mv).collect()),
                 key=str)
    assert got == sorted([("a", None, 11.0), ("a", "x", 2.0),
                          (None, "x", 3.0)], key=str)


def test_refresh_across_compaction_is_noop_delta(spark, tmp_path):
    src, mv = str(tmp_path / "s"), str(tmp_path / "m")
    append_version(_src(spark, [(1, "a", 1.0)]), src,
                   stats_columns=["k"])
    create_aggregate_view(spark, src, mv, ["g"], MEASURES)
    compact_table(spark, src)  # rewrites files, changes no rows
    v, frm, to = refresh_aggregate_view(spark, mv)
    assert (frm, to) == (1, 2)
    assert _got(spark, mv) == _expected(spark, [(1, "a", 1.0)])
    # and the marker advanced: a new refresh sees nothing to do
    assert last_source_version(mv) == 2


def test_mv_is_itself_versioned(spark, tmp_path):
    src, mv = str(tmp_path / "s"), str(tmp_path / "m")
    append_version(_src(spark, [(1, "a", 1.0)]), src,
                   stats_columns=["k"])
    create_aggregate_view(spark, src, mv, ["g"], MEASURES)
    append_version(_src(spark, [(2, "b", 2.0)]), src)
    refresh_aggregate_view(spark, mv)
    hist = history(mv)
    assert [h["version"] for h in hist] == [1, 2]
    assert any(t.startswith("mv-src-v") for t in hist[-1]["txns"])


def test_invalid_measures_rejected(spark, tmp_path):
    src = str(tmp_path / "s")
    append_version(_src(spark, [(1, "a", 1.0)]), src)
    with pytest.raises(ValueError, match="unsupported agg"):
        create_aggregate_view(spark, src, str(tmp_path / "m1"), ["g"],
                              [{"name": "z", "agg": "median",
                                "col": "x"}])
    with pytest.raises(ValueError, match="needs a 'col'"):
        create_aggregate_view(spark, src, str(tmp_path / "m2"), ["g"],
                              [{"name": "z", "agg": "sum"}])
    with pytest.raises(ValueError, match="duplicate measure"):
        create_aggregate_view(
            spark, src, str(tmp_path / "m3"), ["g"],
            [{"name": "z", "agg": "count"},
             {"name": "z", "agg": "sum", "col": "x"}])


SCHEMA = "doc_id bigint, g string, x double"


def _write_batch(spark, src, rows, name):
    import os
    (spark.createDataFrame(rows, SCHEMA)
          .coalesce(1).write.mode("overwrite")
          .parquet(os.path.join(src, name)))


def _run_stream(spark, src, t, ckpt, refresh_views=None):
    from esg_decarbonization_data_integration_and_data_pipline_spark.streaming.docs_versioned import (
        stream_versioned_append,
    )

    sdf = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", "1").parquet(src + "/*")
    q = stream_versioned_append(sdf, t, ckpt,
                                refresh_views=refresh_views)
    q.awaitTermination()


def test_stream_maintains_view_per_batch(spark, tmp_path):
    """refresh_views: each non-empty micro-batch commit advances the
    MV too, and the view equals a from-scratch GROUP BY of the whole
    table after the stream drains."""
    src, t, mv, ck = (str(tmp_path / "src"), str(tmp_path / "t"),
                      str(tmp_path / "m"), str(tmp_path / "ck"))
    b0 = [(1, "a", 1.0), (2, "b", 4.0)]
    _write_batch(spark, src, b0, "b0")
    _run_stream(spark, src, t, ck)  # seeds v1
    create_aggregate_view(spark, t, mv, ["g"], MEASURES)
    b1 = [(3, "a", 5.0)]
    b2 = [(4, "c", 7.0), (5, "b", 2.0)]
    _write_batch(spark, src, b1, "b1")
    _write_batch(spark, src, b2, "b2")
    _run_stream(spark, src, t, ck, refresh_views=[mv])
    assert last_source_version(mv) == current_version(t) == 3
    rows = [(r[0], r[1], r[2]) for r in (b0 + b1 + b2)]
    assert _got(spark, mv) == _expected(spark, rows)
    # one MV commit per refreshed batch: create + 2 stream batches
    assert current_version(mv) == 3


def test_stream_refresh_lag_catches_up(spark, tmp_path):
    """A batch-side append that bypassed the stream (or a crash after
    append, before refresh) leaves the MV behind; the NEXT streamed
    batch's refresh folds ALL outstanding source versions, not just
    its own."""
    src, t, mv, ck = (str(tmp_path / "src"), str(tmp_path / "t"),
                      str(tmp_path / "m"), str(tmp_path / "ck"))
    _write_batch(spark, src, [(1, "a", 1.0)], "b0")
    _run_stream(spark, src, t, ck)
    create_aggregate_view(spark, t, mv, ["g"], MEASURES)
    # out-of-band append: MV now lags by one source version
    append_version(spark.createDataFrame([(2, "b", 3.0)], SCHEMA), t)
    _write_batch(spark, src, [(3, "a", 9.0)], "b1")
    _run_stream(spark, src, t, ck, refresh_views=[mv])
    assert last_source_version(mv) == current_version(t) == 3
    assert _got(spark, mv) == _expected(
        spark, [(1, "a", 1.0), (2, "b", 3.0), (3, "a", 9.0)])
    # replayed refresh (source unchanged) commits nothing
    v = current_version(mv)
    refresh_aggregate_view(spark, mv)
    assert current_version(mv) == v
