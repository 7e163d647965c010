"""Conditional multi-clause MERGE (io/versioned.merge_clauses): the
Delta MERGE INTO clause surface -- ordered matched update/delete,
not-matched insert, not-matched-by-source update/delete -- with
first-match-wins semantics, the source-cardinality contract, O(touched)
copy-on-write without by-source clauses, and txn idempotence."""

from __future__ import annotations

import pytest

from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
    MergeCardinalityError, _data_files, append_version, current_version,
    merge_clauses, read_current, read_version,
)


def _kvq(spark, rows):
    return spark.createDataFrame(rows, "k bigint, a string, q bigint")


def _table(spark, tmp_path):
    """Three stats-tracked appends with disjoint key ranges 0-9 /
    10-19 / 20-29, q = k * 10."""
    t = str(tmp_path / "t")
    for lo in (0, 10, 20):
        append_version(
            _kvq(spark, [(k, f"old{k}", k * 10)
                         for k in range(lo, lo + 10)]).coalesce(1),
            t, stats_columns=["k"])
    return t


def test_conditional_update_delete_insert_one_commit(spark, tmp_path):
    t = _table(spark, tmp_path)
    src = _kvq(spark, [
        (5, "up5", 999),    # matched, q>=50 false -> update clause
        (15, "up15", 999),  # matched, q>=150 true -> delete clause
        (40, "new40", 400),  # unmatched -> insert
    ])
    n = merge_clauses(spark, t, src, "k", [
        {"when": "matched", "action": "delete",
         "condition": "t.q >= 150"},
        {"when": "matched", "action": "update",
         "set": {"a": "s.a", "q": "t.q + s.q"}},
        {"when": "not_matched", "action": "insert"},
    ])
    rows = {r.k: (r.a, r.q) for r in read_current(spark, t).collect()}
    assert len(rows) == 30  # 30 - 1 deleted + 1 inserted
    assert rows[5] == ("up5", 50 + 999)   # partial-expr update
    assert 15 not in rows                  # delete clause won (listed first)
    assert rows[40] == ("new40", 400)      # default insert = s columns
    assert rows[0] == ("old0", 0)          # untouched passes through
    # time travel sees the pre-merge table
    assert {r.k for r in read_version(spark, t, 3).collect()} == set(range(30))
    assert n == 4


def test_first_match_wins_order(spark, tmp_path):
    t = _table(spark, tmp_path)
    src = _kvq(spark, [(5, "x", 0)])
    # both clauses' conditions hold; the FIRST (update) must apply
    merge_clauses(spark, t, src, "k", [
        {"when": "matched", "action": "update", "set": {"a": "'first'"}},
        {"when": "matched", "action": "delete"},
    ])
    rows = {r.k: r.a for r in read_current(spark, t).collect()}
    assert rows[5] == "first"


def test_matched_row_without_applying_clause_passes_through(spark, tmp_path):
    t = _table(spark, tmp_path)
    src = _kvq(spark, [(5, "x", 0)])
    merge_clauses(spark, t, src, "k", [
        {"when": "matched", "action": "update",
         "set": {"a": "'never'"}, "condition": "1 = 0"},
    ])
    rows = {r.k: r.a for r in read_current(spark, t).collect()}
    assert rows[5] == "old5"
    assert len(rows) == 30


def test_unmatched_source_without_insert_clause_is_dropped(spark, tmp_path):
    t = _table(spark, tmp_path)
    src = _kvq(spark, [(99, "x", 0)])
    merge_clauses(spark, t, src, "k", [
        {"when": "matched", "action": "update", "set": {"a": "s.a"}},
    ])
    assert 99 not in {r.k for r in read_current(spark, t).collect()}


def test_insert_values_and_condition(spark, tmp_path):
    t = _table(spark, tmp_path)
    src = _kvq(spark, [(50, "yes", 7), (60, "no", -1)])
    merge_clauses(spark, t, src, "k", [
        {"when": "not_matched", "action": "insert",
         "condition": "s.q > 0",
         "values": {"k": "s.k", "a": "upper(s.a)", "q": "s.q * 2"}},
    ])
    rows = {r.k: (r.a, r.q) for r in read_current(spark, t).collect()}
    assert rows[50] == ("YES", 14)
    assert 60 not in rows  # condition false -> not inserted


def test_by_source_delete_and_update(spark, tmp_path):
    t = _table(spark, tmp_path)
    src = _kvq(spark, [(k, f"s{k}", 0) for k in range(10, 30)])
    merge_clauses(spark, t, src, "k", [
        {"when": "not_matched_by_source", "action": "delete",
         "condition": "t.k < 5"},
        {"when": "not_matched_by_source", "action": "update",
         "set": {"a": "'stale'"}},
    ])
    rows = {r.k: r.a for r in read_current(spark, t).collect()}
    assert set(rows) == set(range(5, 30))       # 0-4 deleted
    assert all(rows[k] == "stale" for k in range(5, 10))
    assert all(rows[k] == f"old{k}" for k in range(10, 30))  # matched untouched


def test_pruning_without_by_source_clauses(spark, tmp_path):
    t = _table(spark, tmp_path)
    before = set(_data_files(t, current_version(t)))
    merge_clauses(spark, t, _kvq(spark, [(15, "x", 0)]), "k", [
        {"when": "matched", "action": "update", "set": {"a": "s.a"}},
    ])
    after = _data_files(t, current_version(t))
    # only the 10-19 file was rewritten; the other two inherit
    assert len([f for f in after if f in before]) == 2


def test_by_source_rewrites_every_file(spark, tmp_path):
    t = _table(spark, tmp_path)
    before = set(_data_files(t, current_version(t)))
    merge_clauses(spark, t, _kvq(spark, [(15, "x", 0)]), "k", [
        {"when": "not_matched_by_source", "action": "update",
         "set": {"a": "t.a"}},
    ])
    after = _data_files(t, current_version(t))
    assert not any(f in before for f in after)


def test_cardinality_violation_raises_before_commit(spark, tmp_path):
    t = _table(spark, tmp_path)
    dup = _kvq(spark, [(5, "a1", 0), (5, "a2", 0)])
    with pytest.raises(MergeCardinalityError):
        merge_clauses(spark, t, dup, "k", [
            {"when": "matched", "action": "update", "set": {"a": "s.a"}},
        ])
    assert current_version(t) == 3  # nothing committed


def test_by_source_only_merge_still_enforces_cardinality(
        spark, tmp_path):
    """A merge with NO matched clause still runs the full-outer join
    when by-source clauses exist -- a duplicate matched source key
    there would silently duplicate the target row, so the guard must
    fire (r15 advisor finding: the check used to gate on matched_cl,
    letting [(1,a),(2,b)] + dup source key 1 + by-source-only clauses
    commit [(1,a),(1,a),(2,stale)])."""
    t = _table(spark, tmp_path)
    dup = _kvq(spark, [(5, "a1", 0), (5, "a2", 0)])
    with pytest.raises(MergeCardinalityError):
        merge_clauses(spark, t, dup, "k", [
            {"when": "not_matched_by_source", "action": "update",
             "set": {"a": "'stale'"}},
        ])
    assert current_version(t) == 3  # nothing committed
    rows = {r.k: r.a for r in read_current(spark, t).collect()}
    assert len(rows) == 30 and rows[5] == "old5"  # no dup, no stale
    # same guard on the mixed insert + by-source shape (still the
    # full-outer path even though no clause touches matched rows)
    with pytest.raises(MergeCardinalityError):
        merge_clauses(spark, t, dup, "k", [
            {"when": "not_matched", "action": "insert"},
            {"when": "not_matched_by_source", "action": "delete"},
        ])


def test_duplicate_unmatched_source_keys_insert_twice(spark, tmp_path):
    t = _table(spark, tmp_path)
    dup = _kvq(spark, [(77, "a1", 1), (77, "a2", 2)])
    merge_clauses(spark, t, dup, "k", [
        {"when": "not_matched", "action": "insert"},
    ])
    got = [r for r in read_current(spark, t).collect() if r.k == 77]
    assert len(got) == 2  # Delta allows multi-insert of unmatched dups


def test_txn_replay_is_noop(spark, tmp_path):
    t = _table(spark, tmp_path)
    cl = [{"when": "matched", "action": "update", "set": {"q": "t.q + 1"}}]
    src = _kvq(spark, [(5, "x", 0)])
    n1 = merge_clauses(spark, t, src, "k", cl, txn="job-1")
    n2 = merge_clauses(spark, t, src, "k", cl, txn="job-1")
    assert n1 == n2
    rows = {r.k: r.q for r in read_current(spark, t).collect()}
    assert rows[5] == 51  # incremented exactly once


def test_update_value_cast_to_target_type(spark, tmp_path):
    t = _table(spark, tmp_path)
    merge_clauses(spark, t, _kvq(spark, [(5, "x", 0)]), "k", [
        {"when": "matched", "action": "update",
         "set": {"q": "2.9"}},  # double literal -> bigint column
    ])
    df = read_current(spark, t)
    assert dict(df.dtypes)["q"] == "bigint"
    assert {r.q for r in df.filter("k = 5").collect()} == {2}


def test_refusals(spark, tmp_path):
    t = _table(spark, tmp_path)
    src = _kvq(spark, [(5, "x", 0)])
    with pytest.raises(ValueError, match="target only"):
        merge_clauses(spark, t, src, "k", [
            {"when": "not_matched_by_source", "action": "delete",
             "condition": "s.q > 0"}])
    with pytest.raises(ValueError, match="matched action"):
        merge_clauses(spark, t, src, "k", [
            {"when": "matched", "action": "insert"}])
    with pytest.raises(ValueError, match="not_matched action"):
        merge_clauses(spark, t, src, "k", [
            {"when": "not_matched", "action": "update"}])
    with pytest.raises(ValueError, match="when must be"):
        merge_clauses(spark, t, src, "k", [
            {"when": "sometimes", "action": "update"}])
    with pytest.raises(ValueError, match="at least one clause"):
        merge_clauses(spark, t, src, "k", [])
    with pytest.raises(ValueError, match="merge key"):
        merge_clauses(spark, t, src.drop("k"), "k", [
            {"when": "matched", "action": "delete"}])


# --- r14 review-pass regressions ------------------------------------


def test_unknown_assignment_column_raises(spark, tmp_path):
    t = _table(spark, tmp_path)
    src = _kvq(spark, [(5, "x", 0)])
    with pytest.raises(ValueError, match="assignment column"):
        merge_clauses(spark, t, src, "k", [
            {"when": "matched", "action": "update",
             "set": {"aa": "s.a"}}])  # typo'd column
    with pytest.raises(ValueError, match="assignment column"):
        merge_clauses(spark, t, src, "k", [
            {"when": "not_matched", "action": "insert",
             "values": {"k": "s.k", "nope": "1"}}])


def test_insert_only_merge_allows_matched_duplicates(spark, tmp_path):
    """Delta permits duplicate source keys when no matched clause
    could apply; the matched target row must NOT duplicate and the
    commit must be a pure append (zero files rewritten)."""
    t = _table(spark, tmp_path)
    before = set(_data_files(t, current_version(t)))
    src = _kvq(spark, [(5, "d1", 0), (5, "d2", 0), (77, "new", 1)])
    merge_clauses(spark, t, src, "k", [
        {"when": "not_matched", "action": "insert"},
    ])
    after = _data_files(t, current_version(t))
    assert before <= set(after)  # every base file inherited verbatim
    rows = [r for r in read_current(spark, t).collect()]
    assert len([r for r in rows if r.k == 5]) == 1   # not duplicated
    assert {r.a for r in rows if r.k == 5} == {"old5"}  # untouched
    assert len([r for r in rows if r.k == 77]) == 1


def test_by_source_guard_is_case_insensitive_and_literal_safe(
        spark, tmp_path):
    t = _table(spark, tmp_path)
    src = _kvq(spark, [(5, "x", 0)])
    with pytest.raises(ValueError, match="target only"):
        merge_clauses(spark, t, src, "k", [
            {"when": "not_matched_by_source", "action": "delete",
             "condition": "S.q > 0"}])  # upper-case alias still binds
    # a string LITERAL containing 's.' must not trigger the refusal
    merge_clauses(spark, t, src, "k", [
        {"when": "not_matched_by_source", "action": "update",
         "set": {"a": "'s. dept'"}, "condition": "t.k = 0"}])
    assert {r.a for r in read_current(spark, t).filter("k = 0")
            .collect()} == {"s. dept"}
    # DOUBLE-quoted literals are strings too under Spark's default
    # non-ANSI parser -- "s. dept" must not be refused either (r15
    # advisor finding), and a backtick-quoted ALIAS is still a real
    # source reference so `s`.q must be refused
    merge_clauses(spark, t, src, "k", [
        {"when": "not_matched_by_source", "action": "update",
         "set": {"a": '"s. dept2"'}, "condition": "t.k = 1"}])
    assert {r.a for r in read_current(spark, t).filter("k = 1")
            .collect()} == {"s. dept2"}
    with pytest.raises(ValueError, match="target only"):
        merge_clauses(spark, t, src, "k", [
            {"when": "not_matched_by_source", "action": "delete",
             "condition": "`s`.q > 0"}])


def test_insert_clause_referencing_target_is_refused(spark, tmp_path):
    t = _table(spark, tmp_path)
    src = _kvq(spark, [(99, "x", 0)])
    with pytest.raises(ValueError, match="source only"):
        merge_clauses(spark, t, src, "k", [
            {"when": "not_matched", "action": "insert",
             "condition": "t.q > 0"}])
    with pytest.raises(ValueError, match="source only"):
        merge_clauses(spark, t, src, "k", [
            {"when": "not_matched", "action": "insert",
             "values": {"k": "s.k", "a": "T.a", "q": "0"}}])


def test_merge_schema_evolution_adds_source_column(spark, tmp_path):
    """merge_schema=True: a source-only column appends as nullable --
    untouched/by-source rows read NULL, updates and inserts may set
    it, and pre-evolution files align on read."""
    t = _table(spark, tmp_path)
    src = spark.createDataFrame(
        [(5, "up5", 1, "extra5"), (77, "new", 2, "extra77")],
        "k bigint, a string, q bigint, x string")
    merge_clauses(spark, t, src, "k", [
        {"when": "matched", "action": "update",
         "set": {"a": "s.a", "x": "s.x"}},
        {"when": "not_matched", "action": "insert"},
    ], merge_schema=True)
    df = read_current(spark, t)
    assert dict(df.dtypes)["x"] == "string"
    rows = {r.k: (r.a, r.x) for r in df.collect()}
    assert rows[5] == ("up5", "extra5")
    assert rows[77] == ("new", "extra77")
    # key 15 lives in an UNTOUCHED (inherited, pre-evolution) file
    # -- the evolved-schema read must surface NULL for it; key 0's
    # file was rewritten by the merge, so it proves nothing here
    assert rows[15] == ("old15", None)
    assert rows[0] == ("old0", None)
    assert len(rows) == 31


def test_merge_schema_type_conflict_raises(spark, tmp_path):
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
        SchemaMismatchError,
    )

    t = _table(spark, tmp_path)
    src = spark.createDataFrame([(5, 1.5)], "k bigint, a double")
    with pytest.raises(SchemaMismatchError, match="type conflict"):
        merge_clauses(spark, t, src, "k", [
            {"when": "matched", "action": "update", "set": {"a": "'x'"}},
        ], merge_schema=True)


def test_without_merge_schema_extra_source_columns_ignored(spark, tmp_path):
    t = _table(spark, tmp_path)
    src = spark.createDataFrame(
        [(5, "up5", 1, "extra")], "k bigint, a string, q bigint, x string")
    merge_clauses(spark, t, src, "k", [
        {"when": "matched", "action": "update", "set": {"a": "s.a"}},
    ])
    df = read_current(spark, t)
    assert "x" not in df.columns
    assert {r.a for r in df.filter("k = 5").collect()} == {"up5"}
