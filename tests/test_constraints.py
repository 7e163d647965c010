"""Write-time table constraints (io/constraints): declared once on a
versioned table, enforced on every append/merge before anything
stages -- the Delta CHECK/NOT NULL contract at the storage boundary."""

from __future__ import annotations

import os

import pytest

from esg_decarbonization_data_integration_and_data_pipline_spark.io.constraints import (
    drop_table_constraints,
    set_table_constraints,
    table_constraints,
)
from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
    append_version,
    current_version,
    delete_keys_version,
    merge_version,
    read_current,
)
from esg_decarbonization_data_integration_and_data_pipline_spark.operators.expectations import (
    CheckFailedError,
    foreign_key,
    in_range,
    in_set,
    matches,
    not_null,
    unique,
)


def _kv(spark, pairs):
    return spark.createDataFrame(pairs, "k bigint, amt double")


SUITE = [not_null("k"), in_range("amt", lo=0.0)]


def test_violating_append_never_becomes_a_version(spark, tmp_path):
    t = str(tmp_path / "t")
    append_version(_kv(spark, [(1, 10.0)]), t)
    set_table_constraints(spark, t, SUITE)
    with pytest.raises(CheckFailedError, match="in_range:amt"):
        append_version(_kv(spark, [(2, -5.0)]), t)
    assert current_version(t) == 1  # nothing staged, nothing committed
    append_version(_kv(spark, [(2, 5.0)]), t)
    assert current_version(t) == 2


def test_merge_validates_updates_only(spark, tmp_path):
    t = str(tmp_path / "t")
    append_version(_kv(spark, [(1, 10.0), (2, 20.0)]).coalesce(1), t,
                   stats_columns=["k"])
    set_table_constraints(spark, t, SUITE)
    with pytest.raises(CheckFailedError):
        merge_version(spark, t, _kv(spark, [(1, -1.0)]), "k")
    assert current_version(t) == 1
    merge_version(spark, t, _kv(spark, [(1, 99.0)]), "k")
    got = sorted((r.k, r.amt) for r in read_current(spark, t).collect())
    assert got == [(1, 99.0), (2, 20.0)]
    # deletes carry no rows to validate
    delete_keys_version(
        spark, t, spark.createDataFrame([(2,)], "k bigint"), "k")
    assert sorted(r.k for r in read_current(spark, t).collect()) == [1]


def test_add_constraint_validates_existing_data(spark, tmp_path):
    t = str(tmp_path / "t")
    append_version(_kv(spark, [(1, -3.0)]), t)
    with pytest.raises(CheckFailedError):
        set_table_constraints(spark, t, SUITE)
    assert table_constraints(t) == []  # refused -> nothing declared
    # a constraint the data satisfies is accepted
    set_table_constraints(spark, t, [not_null("k")])
    assert [c.label for c in table_constraints(t)] == ["not_null:k"]


def test_non_row_level_kinds_refused_at_set_time(spark, tmp_path):
    t = str(tmp_path / "t")
    append_version(_kv(spark, [(1, 1.0)]), t)
    with pytest.raises(ValueError, match="row-level"):
        set_table_constraints(spark, t, [unique("k")])
    ref = spark.createDataFrame([(1,)], "k bigint")
    with pytest.raises(ValueError, match="row-level"):
        set_table_constraints(spark, t, [foreign_key("k", ref, "k")])


def test_drop_constraints_by_name_and_all(spark, tmp_path):
    t = str(tmp_path / "t")
    append_version(_kv(spark, [(1, 1.0)]), t)
    set_table_constraints(spark, t, SUITE)
    assert drop_table_constraints(t, ["in_range:amt"]) == [
        "in_range:amt"]
    assert [c.label for c in table_constraints(t)] == ["not_null:k"]
    append_version(_kv(spark, [(2, -5.0)]), t)  # range gone
    assert drop_table_constraints(t) == ["not_null:k"]
    assert table_constraints(t) == []
    assert not os.path.exists(os.path.join(t, "_CONSTRAINTS.json"))
    assert drop_table_constraints(t) == []


def test_constraints_survive_roundtrip_with_all_kinds(spark, tmp_path):
    t = str(tmp_path / "t")
    df = spark.createDataFrame([(1, 5.0, "F", "1-URGENT")],
                               "k bigint, amt double, st string, "
                               "pri string")
    append_version(df, t)
    set_table_constraints(spark, t, [
        not_null("k"), in_range("amt", lo=0.0, hi=100.0),
        in_set("st", ("F", "O", "P")), matches("pri", "^[1-5]-"),
    ])
    loaded = table_constraints(t)
    assert [c.kind for c in loaded] == ["not_null", "in_range",
                                        "in_set", "matches"]
    assert loaded[1].lo == 0.0 and loaded[1].hi == 100.0
    assert loaded[2].values == ("F", "O", "P")
    assert loaded[3].pattern == "^[1-5]-"
    bad = spark.createDataFrame([(2, 5.0, "X", "1-URGENT")],
                                df.schema)
    with pytest.raises(CheckFailedError, match="in_set:st"):
        append_version(bad, t)


def test_not_null_constraint_on_missing_batch_column(spark, tmp_path):
    t = str(tmp_path / "t")
    append_version(_kv(spark, [(1, 1.0)]), t)
    set_table_constraints(spark, t, [not_null("amt")])
    narrow = spark.createDataFrame([(2,)], "k bigint")
    # the narrow batch's rows would read back NULL amt -- the
    # constraint must fail it loudly, not skip silently
    with pytest.raises(CheckFailedError, match="not_null:amt"):
        append_version(narrow, t, merge_schema=True)


def test_streaming_sink_inherits_enforcement(spark, tmp_path):
    """stream_versioned_append commits through append_version, so the
    constraint gate applies to micro-batches with no sink changes --
    spot-checked here via the same direct append path the sink
    calls per batch (txn-keyed)."""
    t = str(tmp_path / "t")
    append_version(_kv(spark, [(1, 1.0)]), t)
    set_table_constraints(spark, t, SUITE)
    with pytest.raises(CheckFailedError):
        append_version(_kv(spark, [(2, -1.0)]), t, txn="batch-7")
    # the failed batch left no txn marker: a corrected retry under
    # the same token commits (not treated as a replay)
    append_version(_kv(spark, [(2, 1.0)]), t, txn="batch-7")
    assert current_version(t) == 2


def test_write_version_snapshot_is_also_gated(spark, tmp_path):
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import write_version

    t = str(tmp_path / "t")
    append_version(_kv(spark, [(1, 1.0)]), t)
    set_table_constraints(spark, t, SUITE)
    with pytest.raises(CheckFailedError):
        write_version(_kv(spark, [(9, -1.0)]), t)
    assert current_version(t) == 1
    write_version(_kv(spark, [(9, 1.0)]), t)
    assert current_version(t) == 2


def test_drop_columns_refuses_constrained_column(spark, tmp_path):
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import drop_columns

    t = str(tmp_path / "t")
    append_version(_kv(spark, [(1, 1.0)]), t)
    set_table_constraints(spark, t, SUITE)
    with pytest.raises(ValueError, match="drop_table_constraints"):
        drop_columns(spark, t, "amt")
    drop_table_constraints(t, ["in_range:amt"])
    drop_columns(spark, t, "amt")  # now legal
    assert read_current(spark, t).columns == ["k"]


def test_unknown_or_case_mismatched_column_refused(spark, tmp_path):
    t = str(tmp_path / "t")
    append_version(_kv(spark, [(1, 1.0)]), t)
    with pytest.raises(ValueError, match="case-exact"):
        set_table_constraints(spark, t, [not_null("nope")])
    with pytest.raises(ValueError, match="case-exact"):
        set_table_constraints(spark, t, [not_null("K")])
    assert table_constraints(t) == []


def test_raced_violating_commit_rolls_the_declaration_back(
        spark, tmp_path, monkeypatch):
    """A writer whose constraint check (file absent) preceded the
    declaration commits a violating batch mid-set: the
    re-validation loop catches it AND rolls the declaration back, so
    'constrained' keeps meaning 'validated'."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.io import constraints as C
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import _manifest_commit

    t = str(tmp_path / "t")
    append_version(_kv(spark, [(1, 1.0)]), t)
    real = C._write_constraints

    def land_then_race(table_dir, checks):
        real(table_dir, checks)
        # the racing writer validated BEFORE the file landed, so its
        # commit bypasses enforcement (enforce_constraints=False is
        # exactly that already-checked state)
        _manifest_commit(_kv(spark, [(2, -9.0)]), t, txn=None,
                         pinned_base=None, inherit_files=True,
                         max_attempts=5, backend=None)

    monkeypatch.setattr(C, "_write_constraints", land_then_race)
    with pytest.raises(CheckFailedError):
        set_table_constraints(spark, t, SUITE)
    # rolled back: the table is NOT constrained, writes still flow
    assert table_constraints(t) == []
    append_version(_kv(spark, [(3, -1.0)]), t)


def test_audit_constraints_over_history(spark, tmp_path):
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.constraints import audit_constraints

    t = str(tmp_path / "t")
    # v1 violates the future range constraint; a merge fixes v2
    append_version(_kv(spark, [(1, -5.0), (2, 3.0)]).coalesce(1), t,
                   stats_columns=["k", "amt"])
    merge_version(spark, t, _kv(spark, [(1, 5.0)]), "k")
    set_table_constraints(spark, t, SUITE)  # current (v2) passes
    rows = audit_constraints(spark, t)
    by = {(r["version"], r["check_name"]): r for r in rows}
    assert by[(1, "in_range:amt")]["n_violations"] == 1
    assert not by[(1, "in_range:amt")]["passed"]
    assert by[(2, "in_range:amt")]["n_violations"] == 0
    assert by[(1, "not_null:k")]["passed"]
    assert by[(2, "not_null:k")]["passed"]
    with pytest.raises(ValueError, match="declares no constraints"):
        audit_constraints(spark, str(tmp_path / "t2"))


def test_audit_constraints_missing_column_version(spark, tmp_path):
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.constraints import audit_constraints

    t = str(tmp_path / "t")
    append_version(spark.createDataFrame([(1,), (2,)], "k bigint")
                   .coalesce(1), t)
    append_version(_kv(spark, [(3, 1.0)]).coalesce(1), t,
                   merge_schema=True)
    set_table_constraints(spark, t, [in_range("amt", lo=0.0)])
    rows = audit_constraints(spark, t)
    by = {(r["version"], r["check_name"]): r for r in rows}
    # v1 predates amt entirely: range skips the absent column
    # vacuously (0 violations over its 2 rows)
    assert by[(1, "in_range:amt")]["n_violations"] == 0
    assert by[(1, "in_range:amt")]["n_rows"] == 2
    assert by[(2, "in_range:amt")]["passed"]


def test_true_stream_fail_stops_on_violating_batch(spark, tmp_path):
    """End-to-end through readStream -> stream_versioned_append: a
    constrained table FAIL-STOPS the query on a violating
    micro-batch (the keep-flowing alternative is the quarantine
    sink), commits nothing for it, and a corrected rerun converges
    with the clean batch applied exactly once."""
    import os

    from pyspark.sql.streaming import StreamingQueryException

    from esg_decarbonization_data_integration_and_data_pipline_spark.streaming.docs_versioned import (
        stream_versioned_append,
    )

    src = str(tmp_path / "src")
    t = str(tmp_path / "t")
    os.makedirs(src)
    append_version(_kv(spark, [(1, 1.0)]), t)
    set_table_constraints(spark, t, SUITE)

    def land(rows, name):
        (_kv(spark, rows).coalesce(1).write.mode("overwrite")
         .parquet(os.path.join(src, name)))

    land([(2, 5.0)], "b1")          # clean
    land([(3, -7.0)], "b2")         # violates in_range:amt

    sdf = (spark.readStream.schema("k bigint, amt double")
           .option("maxFilesPerTrigger", "1").parquet(src + "/*"))
    q = stream_versioned_append(sdf, t, str(tmp_path / "ck"))
    with pytest.raises(StreamingQueryException, match="in_range:amt"):
        q.awaitTermination()
    got = {(r.k, r.amt) for r in read_current(spark, t).collect()}
    assert got == {(1, 1.0), (2, 5.0)}  # clean batch in, bad one out
    # fix upstream and restart on the SAME checkpoint: the failed
    # batch replays corrected; the clean batch's txn marker stops a
    # double-append
    land([(3, 7.0)], "b2")
    q2 = stream_versioned_append(sdf, t, str(tmp_path / "ck"))
    q2.awaitTermination()
    got = {(r.k, r.amt) for r in read_current(spark, t).collect()}
    assert got == {(1, 1.0), (2, 5.0), (3, 7.0)}
