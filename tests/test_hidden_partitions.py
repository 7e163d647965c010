"""Hidden (generated) partitioning -- io/transforms + the
write_version/append_version wiring: Iceberg-style partition
transforms whose derived value lives only in the directory layout,
with predicate-on-source-column pruning and exact reads."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from esg_decarbonization_data_integration_and_data_pipline_spark.io.transforms import (
    bucket_value,
    keep_file,
    parse_partition_spec,
    read_partspec,
)
from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
    _data_files,
    append_version,
    pruned_files,
    read_current,
    read_where,
    write_version,
)


def _orders(spark, n=400):
    return spark.range(n).select(
        F.col("id"),
        F.expr("date_add(date'1996-01-01', cast(id * 4 as int))")
         .alias("d"),
        (F.col("id").cast("double") * 1.5).alias("amt"),
        F.concat(F.lit("cat_"), (F.col("id") % 7).cast("string"))
         .alias("cat"))


@pytest.fixture()
def ytable(spark, tmp_path):
    td = str(tmp_path / "y")
    write_version(_orders(spark), td, partition_by=("year(d)",),
                  stats_columns=["id"])
    return td


def test_spec_parsing_and_refusals(spark):
    st = _orders(spark).schema
    spec = parse_partition_spec(
        ["year(d)", "bucket(8, id)", "truncate(4, cat)", "cat"], st)
    assert [s["dir"] for s in spec] == [
        "d_year", "id_bucket", "cat_truncate", "cat"]
    assert [s["transform"] for s in spec] == [
        "year", "bucket", "truncate", "identity"]
    with pytest.raises(ValueError, match="not in the schema"):
        parse_partition_spec(["year(nope)"], st)
    with pytest.raises(ValueError, match="unrecognized"):
        parse_partition_spec(["pow(2, d)"], st)
    with pytest.raises(ValueError, match="N must be positive"):
        parse_partition_spec(["bucket(0, id)"], st)
    with pytest.raises(ValueError, match="collides"):
        parse_partition_spec(
            ["year(d)"],
            _orders(spark).withColumn("d_year", F.lit(1)).schema)
    # source-type enforcement: the md5 twin's contract only holds
    # for int/string buckets, and year() needs a temporal source
    with pytest.raises(ValueError, match="needs one of"):
        parse_partition_spec(["bucket(8, amt)"], st)
    with pytest.raises(ValueError, match="needs one of"):
        parse_partition_spec(["year(id)"], st)
    with pytest.raises(ValueError, match="needs one of"):
        parse_partition_spec(["truncate(2, d)"], st)


def test_year_transform_layout_and_schema(spark, ytable):
    # the derived column lives ONLY in the layout
    files = _data_files(ytable, 1)
    assert files and all("d_year=" in f for f in files)
    cur = read_current(spark, ytable)
    assert cur.columns == ["id", "d", "amt", "cat"]  # hidden stays hidden
    assert cur.count() == 400
    assert read_partspec(ytable, 1) == [
        {"dir": "d_year", "transform": "year", "src": "d",
         "param": None, "src_type": "date"}]


def test_year_transform_prunes_source_range(spark, ytable):
    lo = datetime.date(1997, 2, 1)
    hi = datetime.date(1997, 11, 30)
    kept, total = pruned_files(ytable, 1, "d", lo, hi)
    assert kept and len(kept) < total
    assert all("d_year=1997" in f for f in kept)
    got = read_where(spark, ytable, "d", lo, hi)
    exp = (_orders(spark)
           .filter((F.col("d") >= F.lit(lo)) & (F.col("d") <= F.lit(hi))))
    assert got.count() == exp.count() > 0
    # exactness: pruning must not change values
    assert (sorted(r.id for r in got.collect())
            == sorted(r.id for r in exp.collect()))


def test_month_transform_lexicographic_prune(spark, tmp_path):
    td = str(tmp_path / "m")
    write_version(_orders(spark), td, partition_by=("month(d)",))
    lo, hi = datetime.date(1996, 5, 10), datetime.date(1996, 7, 3)
    kept, total = pruned_files(td, 1, "d", lo, hi)
    assert kept and len(kept) < total
    months = {seg.split("=")[1] for f in kept
              for seg in f.split("/") if seg.startswith("d_month=")}
    assert months == {"1996-05", "1996-06", "1996-07"}
    got = read_where(spark, td, "d", lo, hi).count()
    exp = _orders(spark).filter(
        (F.col("d") >= F.lit(lo)) & (F.col("d") <= F.lit(hi))).count()
    assert got == exp > 0


def test_bucket_transform_equality_prune(spark, tmp_path):
    td = str(tmp_path / "b")
    write_version(_orders(spark), td, partition_by=("bucket(8, id)",))
    kept, total = pruned_files(td, 1, "id", 137, 137)
    assert len(kept) < total
    want = f"id_bucket={bucket_value(137, 8)}"
    assert all(want in f for f in kept)
    assert read_where(spark, td, "id", 137, 137).count() == 1
    # range probes cannot prune buckets (hash is not monotonic)
    kept_r, _ = pruned_files(td, 1, "id", 100, 200)
    assert len(kept_r) == total


def test_truncate_transform_string_prefix(spark, tmp_path):
    td = str(tmp_path / "t")
    write_version(_orders(spark), td,
                  partition_by=("truncate(5, cat)",))
    kept, total = pruned_files(td, 1, "cat", "cat_3", "cat_3")
    assert kept and len(kept) < total
    assert all("cat_truncate=cat_3" in f for f in kept)
    assert read_where(spark, td, "cat", "cat_3", "cat_3").count() \
        == _orders(spark).filter("cat = 'cat_3'").count()


def test_null_source_lands_in_null_dir_and_prunes(spark, tmp_path):
    td = str(tmp_path / "n")
    df = _orders(spark, 50).withColumn(
        "d", F.when(F.col("id") % 10 == 0, F.lit(None))
              .otherwise(F.col("d")))
    write_version(df, td, partition_by=("year(d)",))
    assert any("__HIVE_DEFAULT_PARTITION__" in f
               for f in _data_files(td, 1))
    # bounded range: the null dir is excluded, rows stay exact
    got = read_where(spark, td, "d", datetime.date(1996, 1, 1),
                     datetime.date(1999, 1, 1))
    assert got.count() == 45
    assert read_current(spark, td).filter("d IS NULL").count() == 5


def test_append_with_transform_and_mixed_chain(spark, tmp_path):
    td = str(tmp_path / "a")
    o = _orders(spark)
    append_version(o.filter("id < 200"), td,
                   partition_by=("year(d)",),
                   stats_columns=["id"])
    append_version(o.filter("id >= 200"), td,
                   partition_by=("year(d)",))
    cur = read_current(spark, td)
    assert cur.columns == ["id", "d", "amt", "cat"]
    assert cur.count() == 400
    lo, hi = datetime.date(1997, 1, 1), datetime.date(1997, 12, 31)
    got = read_where(spark, td, "d", lo, hi)
    exp = o.filter((F.col("d") >= F.lit(lo))
                   & (F.col("d") <= F.lit(hi)))
    assert got.count() == exp.count() > 0
    # v2's spec prunes across BOTH appended versions' files
    kept, total = pruned_files(td, 2, "d", lo, hi)
    assert kept and len(kept) < total
    assert all("d_year=1997" in f for f in kept)


def test_keep_file_conservative_cases():
    # unparseable dir values keep the file
    assert keep_file("junk", "year", None,
                     datetime.date(1997, 1, 1), None)
    # absent dir (mixed layout) keeps
    assert keep_file(None, "year", None,
                     datetime.date(1997, 1, 1), None)
    # unbounded probe keeps the null dir, bounded excludes it
    assert keep_file("__HIVE_DEFAULT_PARTITION__", "year", None,
                     None, None)
    assert not keep_file("__HIVE_DEFAULT_PARTITION__", "year", None,
                         datetime.date(1997, 1, 1), None)
    # int truncate maps floor ranges
    assert keep_file("100", "truncate", 100, 137, 250)
    assert not keep_file("0", "truncate", 100, 137, 250)
    assert keep_file("200", "truncate", 100, 137, 250)
    assert not keep_file("300", "truncate", 100, 137, 250)


def test_pushdown_planner_prunes_transform_dirs(spark, ytable):
    from esg_decarbonization_data_integration_and_data_pipline_spark.sources.versioned_source import (
        _PushdownBatchReader,
    )

    rd = _PushdownBatchReader({"path": ytable, "pushdown": "true"}, 1)
    all_n = len(rd.partitions())
    rd._pushed = [("ge", "d", datetime.date(1997, 2, 1)),
                  ("le", "d", datetime.date(1997, 11, 30))]
    parts = rd.partitions()
    assert 0 < len(parts) < all_n
    assert all("d_year=1997" in p.abs_path for p in parts)
    # eq on a date maps through year() to one directory
    rd2 = _PushdownBatchReader({"path": ytable, "pushdown": "true"}, 1)
    rd2._pushed = [("eq", "d", datetime.date(1998, 3, 5))]
    assert all("d_year=1998" in p.abs_path
               for p in rd2.partitions())


def test_pushdown_planner_bucket_and_null_dirs(spark, tmp_path):
    from esg_decarbonization_data_integration_and_data_pipline_spark.sources.versioned_source import (
        _PushdownBatchReader,
    )

    td = str(tmp_path / "pb")
    df = _orders(spark, 60).withColumn(
        "d", F.when(F.col("id") % 10 == 0, F.lit(None))
              .otherwise(F.col("d")))
    write_version(df, td, partition_by=("year(d)", "bucket(8, id)"))
    rd = _PushdownBatchReader({"path": td, "pushdown": "true"}, 1)
    all_n = len(rd.partitions())
    rd._pushed = [("eq", "id", 17)]
    parts = rd.partitions()
    assert 0 < len(parts) < all_n
    want = f"id_bucket={bucket_value(17, 8)}"
    assert all(want in p.abs_path for p in parts)
    # isnull on the source keeps ONLY the transform null dir
    rd3 = _PushdownBatchReader({"path": td, "pushdown": "true"}, 1)
    rd3._pushed = [("isnull", "d", None)]
    parts3 = rd3.partitions()
    assert 0 < len(parts3) < all_n
    assert all("d_year=__HIVE_DEFAULT_PARTITION__" in p.abs_path
               for p in parts3)
    # notnull drops only the null dir
    rd4 = _PushdownBatchReader({"path": td, "pushdown": "true"}, 1)
    rd4._pushed = [("notnull", "d", None)]
    assert not any("d_year=__HIVE_DEFAULT_PARTITION__" in p.abs_path
                   for p in rd4.partitions())


def test_pushdown_end_to_end_values_on_transform_layout(spark, ytable):
    from esg_decarbonization_data_integration_and_data_pipline_spark.sources.versioned_source import (
        register as register_ds,
    )

    register_ds(spark)
    fmt = (spark.read.format("versioned_table").option("path", ytable)
           .option("pushdown", "true").load())
    got = fmt.filter("d >= date'1997-02-01' AND d <= date'1997-11-30'")
    exp = _orders(spark).filter(
        "d >= date'1997-02-01' AND d <= date'1997-11-30'")
    assert got.count() == exp.count() > 0
    assert sorted(r.id for r in got.collect()) \
        == sorted(r.id for r in exp.collect())


def test_compact_relayouts_flat_chain_to_hidden(spark, tmp_path):
    """compact_table accepts transform specs too: one commit
    re-lays a flat append chain out by year(d), after which the
    range prune works on the whole table."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
        compact_table, current_version,
    )

    td = str(tmp_path / "c")
    o = _orders(spark)
    append_version(o.filter("id < 200"), td)
    append_version(o.filter("id >= 200"), td)
    compact_table(spark, td, partition_by=("year(d)",))
    n = current_version(td)
    assert read_current(spark, td).count() == 400
    lo, hi = datetime.date(1997, 1, 1), datetime.date(1997, 12, 31)
    kept, total = pruned_files(td, n, "d", lo, hi)
    assert kept and len(kept) < total
    assert all("d_year=1997" in f for f in kept)


def test_replace_by_transform_reloads_derived_slice(spark, tmp_path):
    """The reference's month reload WITHOUT a month column: the
    replace keys on month(d), so exactly the touched months'
    directories are superseded and everything else inherits by
    reference."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
        current_version, read_version, replace_partitions,
    )

    td = str(tmp_path / "r")
    o = _orders(spark)  # d spans 1996-01-01 .. +1600d
    write_version(o, td, partition_by=("month(d)",))
    # reload 1996-03: keep only even ids, double amt
    repl = (o.filter("d >= date'1996-03-01' AND d <= date'1996-03-31'")
            .filter("id % 2 = 0")
            .withColumn("amt", F.col("amt") * 2))
    n_repl = repl.count()
    replace_partitions(spark, td, repl, ("month(d)",),
                       txn="reload:1996-03")
    v = current_version(td)
    cur = read_current(spark, td)
    mar = cur.filter("d >= date'1996-03-01' AND d <= date'1996-03-31'")
    assert mar.count() == n_repl > 0
    assert mar.filter("id % 2 = 1").count() == 0
    # other months untouched, inherited BY REFERENCE
    before = set(_data_files(td, 1))
    after = set(_data_files(td, v))
    inherited = before & after
    assert inherited and all("d_month=1996-03" not in f
                             for f in inherited)
    assert cur.count() == 400 - \
        o.filter("d >= date'1996-03-01' AND d <= date'1996-03-31'") \
         .count() + n_repl
    # time travel keeps the superseded month
    assert read_version(spark, td, 1).filter(
        "d >= date'1996-03-01' AND d <= date'1996-03-31'").count() > n_repl
    # replay converges (txn marker)
    replace_partitions(spark, td, repl, ("month(d)",),
                       txn="reload:1996-03")
    assert current_version(td) == v


def test_replace_transform_refuses_mismatched_base_layout(
        spark, tmp_path):
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
        replace_partitions,
    )

    td = str(tmp_path / "rm")
    write_version(_orders(spark, 50), td, partition_by=("year(d)",))
    with pytest.raises(ValueError, match="not laid out"):
        replace_partitions(spark, td, _orders(spark, 10),
                           ("month(d)",))


def test_writer_face_still_refuses_transform_specs(spark, tmp_path):
    td = str(tmp_path / "w")
    write_version(_orders(spark, 50), td, partition_by=("year(d)",))
    from esg_decarbonization_data_integration_and_data_pipline_spark.sources.versioned_source import (
        register as register_ds,
    )

    register_ds(spark)
    with pytest.raises(Exception, match="bare partition COLUMN"):
        (_orders(spark, 10).write.format("versioned_table")
         .mode("overwrite").option("path", td)
         .option("partitionBy", "year(d)")
         .option("partitionOverwriteMode", "dynamic").save())


def test_timestamp_source_prune_widens_for_timezones(spark, tmp_path):
    """A month(ts) layout rendered in the WRITE session's timezone
    must not wrongly prune a boundary file for a reader in another
    zone: the prune mapping widens timestamp-sourced probes by one
    day per side (review pass 2), and values stay exact because the
    predicate re-applies row-level."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.transforms import read_partspec

    td = str(tmp_path / "ts")
    df = spark.range(200).select(
        F.col("id"),
        F.expr("timestamp_seconds(828000000 + id * 86400)")
         .alias("ts"),
        (F.col("id") * 1.0).alias("amt"))
    write_version(df, td, partition_by=("month(ts)",))
    assert read_partspec(td, 1)[0]["src_type"] == "timestamp"
    lo = datetime.datetime(1996, 6, 1, 0, 0, 0)
    hi = datetime.datetime(1996, 6, 30, 23, 0, 0)
    kept, total = pruned_files(td, 1, "ts", lo, hi)
    months = {seg.split("=")[1] for f in kept
              for seg in f.split("/") if seg.startswith("ts_month=")}
    # widened: the two neighbour months' boundary dirs stay kept
    assert "1996-06" in months and len(kept) < total
    assert months <= {"1996-05", "1996-06", "1996-07"}
    got = read_where(spark, td, "ts", lo, hi)
    exp = df.filter((F.col("ts") >= F.lit(lo))
                    & (F.col("ts") <= F.lit(hi)))
    assert got.count() == exp.count() > 0
    # keep_file unit: date-typed source stays EXACT (no widening)
    assert not keep_file("1996-05", "month", None,
                         datetime.date(1996, 6, 1),
                         datetime.date(1996, 6, 30),
                         src_type="date")
    # ...but a timestamp source keeps the boundary neighbour
    assert keep_file("1996-05", "month", None,
                     datetime.datetime(1996, 6, 1),
                     datetime.datetime(1996, 6, 30),
                     src_type="timestamp")
    # and a pre-src_type spec (None) is treated as widened
    assert keep_file("1996-05", "month", None,
                     datetime.datetime(1996, 6, 1),
                     datetime.datetime(1996, 6, 30),
                     src_type=None)


def test_spec_rides_inheritance_through_plain_appends(spark, tmp_path):
    """A spec-less append after a transform commit carries the base's
    _PARTSPEC forward, so pruning keeps working on the inherited
    transform-laid files (the new flat files keep conservatively);
    a spec-less COMPACTION resets it."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
        compact_table, current_version,
    )

    td = str(tmp_path / "inh")
    o = _orders(spark)
    append_version(o.filter("id < 300"), td,
                   partition_by=("year(d)",))
    append_version(o.filter("id >= 300"), td)  # plain flat append
    n = current_version(td)
    assert read_partspec(td, n)  # carried forward
    lo, hi = datetime.date(1997, 1, 1), datetime.date(1997, 12, 31)
    kept, total = pruned_files(td, n, "d", lo, hi)
    assert kept and len(kept) < total  # transform files still prune
    got = read_where(spark, td, "d", lo, hi).count()
    exp = o.filter((F.col("d") >= F.lit(lo))
                   & (F.col("d") <= F.lit(hi))).count()
    assert got == exp > 0
    compact_table(spark, td)  # flat re-layout resets the spec
    assert read_partspec(td, current_version(td)) == []


def test_spec_evolution_unions_base_entries(spark, tmp_path):
    """An append under a NEW transform keeps the base's entries for
    the directories it does not shadow, so inherited files prune
    tight under the old spec while new files prune under the new."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import current_version

    td = str(tmp_path / "evo")
    o = _orders(spark)
    append_version(o.filter("id < 300"), td,
                   partition_by=("year(d)",))
    append_version(o.filter("id >= 300"), td,
                   partition_by=("month(d)",))
    n = current_version(td)
    spec = read_partspec(td, n)
    assert {s["dir"] for s in spec} == {"d_month", "d_year"}
    lo, hi = datetime.date(1997, 2, 1), datetime.date(1997, 3, 31)
    kept, total = pruned_files(td, n, "d", lo, hi)
    # both eras prune: year files to d_year=1997, month files to
    # the 1997-02/03 dirs
    assert kept and len(kept) < total
    for f in kept:
        assert ("d_year=1997" in f) or ("d_month=1997-02" in f
                                        or "d_month=1997-03" in f)
    got = read_where(spark, td, "d", lo, hi).count()
    exp = o.filter((F.col("d") >= F.lit(lo))
                   & (F.col("d") <= F.lit(hi))).count()
    assert got == exp > 0


def test_writer_face_transform_layout_matches_jvm_face(
        spark, tmp_path):
    """format('versioned_table') writes lay out hidden transforms
    identically to the function face: same directories, same spec
    sidecar, prunable through both read faces."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.sources.versioned_source import (
        register as register_ds,
    )

    register_ds(spark)
    td = str(tmp_path / "wf")
    o = _orders(spark, 120).withColumn(
        "d", F.when(F.col("id") % 12 == 0, F.lit(None))
              .otherwise(F.col("d")))
    (o.write.format("versioned_table").mode("overwrite")
      .option("path", td)
      .option("partitionBy", "year(d),bucket(4, id)").save())
    files = _data_files(td, 1)
    assert files and all("d_year=" in f and "id_bucket=" in f
                         for f in files)
    assert any("d_year=__HIVE_DEFAULT_PARTITION__" in f
               for f in files)
    spec = read_partspec(td, 1)
    assert [s["dir"] for s in spec] == ["d_year", "id_bucket"]
    cur = read_current(spark, td)
    assert cur.columns == ["id", "d", "amt", "cat"]
    assert cur.count() == 120
    # prune through the function face on the WRITER-laid dirs
    lo, hi = datetime.date(1997, 1, 1), datetime.date(1997, 12, 31)
    kept, total = pruned_files(td, 1, "d", lo, hi)
    assert kept and len(kept) < total
    assert all("d_year=1997" in f for f in kept)
    kb, tb = pruned_files(td, 1, "id", 37, 37)
    assert kb and len(kb) < tb
    assert all(f"id_bucket={bucket_value(37, 4)}" in f for f in kb)
    got = read_where(spark, td, "d", lo, hi)
    exp = o.filter((F.col("d") >= F.lit(lo))
                   & (F.col("d") <= F.lit(hi)))
    assert sorted(r.id for r in got.collect()) \
        == sorted(r.id for r in exp.collect())
    # and the bucket dirs are bit-compatible with the JVM face
    td2 = str(tmp_path / "jvm")
    write_version(o, td2, partition_by=("year(d)", "bucket(4, id)"))
    dirs = lambda t: {seg for f in _data_files(t, 1)
                      for seg in f.split("/") if "=" in seg}
    assert dirs(td) == dirs(td2)


def test_writer_face_append_transform_and_txn(spark, tmp_path):
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import current_version
    from esg_decarbonization_data_integration_and_data_pipline_spark.sources.versioned_source import (
        register as register_ds,
    )

    register_ds(spark)
    td = str(tmp_path / "wa")
    o = _orders(spark, 100)
    w = (o.write.format("versioned_table").mode("append")
         .option("path", td).option("partitionBy", "month(d)")
         .option("txn", "load:1"))
    w.save()
    v = current_version(td)
    w.save()  # replayed txn no-ops
    assert current_version(td) == v
    assert read_current(spark, td).count() == 100
    lo, hi = datetime.date(1996, 4, 1), datetime.date(1996, 5, 31)
    kept, total = pruned_files(td, v, "d", lo, hi)
    assert kept and len(kept) < total


def test_writer_face_refuses_timestamp_temporal_transform(
        spark, tmp_path):
    from esg_decarbonization_data_integration_and_data_pipline_spark.sources.versioned_source import (
        register as register_ds,
    )

    register_ds(spark)
    td = str(tmp_path / "wts")
    df = spark.range(10).select(
        F.col("id"),
        F.expr("timestamp_seconds(828000000 + id)").alias("ts"))
    with pytest.raises(Exception, match="DATE source"):
        (df.write.format("versioned_table").mode("overwrite")
         .option("path", td).option("partitionBy", "month(ts)")
         .save())


def test_stream_writer_refuses_transforms(spark, tmp_path):
    from esg_decarbonization_data_integration_and_data_pipline_spark.sources.versioned_source import (
        register as register_ds,
    )

    register_ds(spark)
    sdf = (spark.readStream.format("rate")
           .option("rowsPerSecond", 1).load()
           .selectExpr("value AS id", "current_date() AS d"))
    q = (sdf.writeStream.format("versioned_table")
         .option("path", str(tmp_path / "st"))
         .option("txnAppId", "x")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .option("partitionBy", "year(d)")
         .trigger(availableNow=True).start())
    with pytest.raises(Exception, match="batch-write shape"):
        q.awaitTermination()


def test_show_partitions_metadata_only(spark, tmp_path):
    """show_partitions answers from manifests alone (no session
    passed anywhere), incl. hidden-transform layouts and the
    null-marker directory, and subtracts DV-deleted rows."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
        delete_keys_dv, show_partitions,
    )

    td = str(tmp_path / "sp")
    df = _orders(spark, 50).withColumn(
        "d", F.when(F.col("id") % 10 == 0, F.lit(None))
              .otherwise(F.col("d")))
    write_version(df, td, partition_by=("year(d)",))
    parts = show_partitions(td)
    vals = {p["values"]["d_year"]: p["n_rows"] for p in parts}
    assert vals[None] == 5
    assert sum(p["n_rows"] for p in parts) == 50
    assert all(p["n_files"] >= 1 for p in parts)
    # dv delete subtracts from the right partition, still metadata
    delete_keys_dv(spark, td,
                   spark.createDataFrame([(1,), (2,)], "id bigint"),
                   "id")
    parts2 = show_partitions(td)
    assert sum(p["n_rows"] for p in parts2) == 48
    # unpartitioned: one entry, empty values
    td2 = str(tmp_path / "flat")
    write_version(_orders(spark, 20).drop("d"), td2)
    flat = show_partitions(td2)
    assert flat == [{"values": {}, "n_files": flat[0]["n_files"],
                     "n_rows": 20}]


def test_int_truncate_transform(spark, tmp_path):
    td = str(tmp_path / "it")
    write_version(_orders(spark), td,
                  partition_by=("truncate(100, id)",))
    kept, total = pruned_files(td, 1, "id", 137, 250)
    assert kept and len(kept) < total
    dirs = {seg.split("=")[1] for f in kept
            for seg in f.split("/") if seg.startswith("id_truncate=")}
    assert dirs == {"100", "200"}
    assert read_where(spark, td, "id", 137, 250).count() == 114


def test_hour_transform_layout_prune_and_zone_independence(
        spark, tmp_path):
    """hour(ts) (r15, Iceberg v2 parity): the directory value is the
    exact epoch-hour index of the INSTANT -- identical whatever the
    write session's timezone (the DST-free UTC contract) -- and a
    tz-aware probe prunes exactly, no widening needed."""
    td = str(tmp_path / "h")
    base = 1_672_531_200_000_000  # 2023-01-01T00:00:00Z in micros
    base_h = base // 3_600_000_000
    df = spark.range(200).select(
        F.col("id"),
        F.when(F.col("id") % 13 == 0,
               F.lit(None).cast("timestamp"))
         .otherwise(F.timestamp_micros(
             F.lit(base)
             + (F.col("id") % 48) * F.lit(3_600_000_000)
             + (F.col("id") % 59) * F.lit(60_000_000))).alias("ts"),
        (F.col("id") * 1.0).alias("amt"))
    write_version(df, td, partition_by=("hour(ts)",))
    assert read_partspec(td, 1)[0]["transform"] == "hour"
    dirs = {seg for f in _data_files(td, 1)
            for seg in f.split("/") if seg.startswith("ts_hour=")}
    assert f"ts_hour={base_h}" in dirs
    assert f"ts_hour={base_h + 47}" in dirs
    assert "ts_hour=__HIVE_DEFAULT_PARTITION__" in dirs
    # the logical schema never gains the derived column
    assert read_current(spark, td).columns == ["id", "ts", "amt"]
    # the SAME frame written under another session zone lays out
    # identically -- the hour index is instant math, not rendering
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Taipei")
    try:
        td2 = str(tmp_path / "h2")
        write_version(df, td2, partition_by=("hour(ts)",))
        assert {seg for f in _data_files(td2, 1)
                for seg in f.split("/")
                if seg.startswith("ts_hour=")} == dirs
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    # tz-aware probes prune EXACTLY to the covered hour directories
    utc = datetime.timezone.utc
    lo = datetime.datetime(2023, 1, 1, 12, tzinfo=utc)
    hi = datetime.datetime(2023, 1, 1, 23, 30, tzinfo=utc)
    kept, total = pruned_files(td, 1, "ts", lo, hi)
    hours = {int(seg.split("=")[1]) for f in kept
             for seg in f.split("/") if seg.startswith("ts_hour=")}
    assert hours == set(range(base_h + 12, base_h + 24))
    assert len(kept) < total
    got = {r.id for r in
           read_where(spark, td, "ts", lo, hi).collect()}
    want = {i for i in range(200)
            if i % 13 != 0 and 12 <= i % 48 <= 23
            and not (i % 48 == 23 and i % 59 > 30)}
    assert got == want


def test_hour_transform_refusals(spark):
    st = _orders(spark).schema  # d is DATE
    with pytest.raises(ValueError, match="hour"):
        parse_partition_spec(["hour(d)"], st)
    ntz = spark.range(1).select(
        F.col("id"),
        F.expr("cast(timestamp_micros(0) as timestamp_ntz)")
         .alias("t"))
    with pytest.raises(ValueError, match="hour"):
        parse_partition_spec(["hour(t)"], ntz.schema)


def test_hour_keep_file_probe_mapping():
    h = "464592"  # 2023-01-01T00:00Z
    naive = datetime.datetime(2023, 1, 1, 0, 30)
    # a naive probe's zone is unknown: widen one day per side
    assert keep_file(h, "hour", None, naive, naive,
                     src_type="timestamp")
    far = datetime.datetime(2023, 1, 2, 2, 30)  # 26.5 h later
    assert not keep_file(h, "hour", None, far, None,
                         src_type="timestamp")
    # tz-aware probes are exact instants: the very next hour prunes
    aware = datetime.datetime(2023, 1, 1, 1,
                              tzinfo=datetime.timezone.utc)
    assert not keep_file(h, "hour", None, aware, None,
                         src_type="timestamp")
    assert keep_file(h, "hour", None, None, aware,
                     src_type="timestamp")
    # conservative: unparseable directory or probe keeps the file
    assert keep_file("garbage", "hour", None, naive, naive,
                     src_type="timestamp")
    assert keep_file(h, "hour", None, "not-a-time", None,
                     src_type="timestamp")
    # the null marker is excluded by any bounded range
    assert not keep_file("__HIVE_DEFAULT_PARTITION__", "hour", None,
                         naive, None, src_type="timestamp")
    assert keep_file("__HIVE_DEFAULT_PARTITION__", "hour", None,
                     None, None, src_type="timestamp")


def test_writer_face_hour_transform_matches_jvm_face(
        spark, tmp_path):
    """hour(ts) through format('versioned_table') (the Arrow write
    face) must lay out identically to write_version -- Spark hands
    the DataSource tz-AWARE Arrow timestamps (instants), and the
    face UTC-casts before the exact epoch-hour floor-div, so a
    non-UTC session zone cannot skew either face."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.sources.versioned_source import (
        register as register_ds,
    )

    register_ds(spark)
    df = spark.range(30).select(
        F.col("id"),
        F.when(F.col("id") % 9 == 0,
               F.lit(None).cast("timestamp"))
         .otherwise(F.timestamp_micros(
             F.lit(1_672_531_200_000_000)
             + (F.col("id") % 5) * F.lit(3_600_000_000))).alias("ts"))
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Taipei")
    try:
        ta = str(tmp_path / "arrow")
        (df.write.format("versioned_table").mode("overwrite")
           .option("path", ta).option("partitionBy", "hour(ts)")
           .save())
        tj = str(tmp_path / "jvm")
        write_version(df, tj, partition_by=("hour(ts)",))
        dirs = {seg for f in _data_files(ta, 1)
                for seg in f.split("/")
                if seg.startswith("ts_hour=")}
        assert dirs == {seg for f in _data_files(tj, 1)
                        for seg in f.split("/")
                        if seg.startswith("ts_hour=")}
        assert "ts_hour=__HIVE_DEFAULT_PARTITION__" in dirs
        assert "ts_hour=464592" in dirs
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    a = {(r.id,) for r in read_current(spark, ta).collect()}
    assert a == {(r.id,) for r in read_current(spark, tj).collect()}
