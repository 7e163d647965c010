"""Sequence packing, sharded export, temperature mixture sampling,
and the Gopher rule gate (round-6 late additions)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from esg_decarbonization_data_integration_and_data_pipline_spark.operators.packing import (
    export_packed_shards, pack_manifest, pack_sequences,
)
from esg_decarbonization_data_integration_and_data_pipline_spark.operators.sampling import (
    temperature_mixture_sample,
)
from esg_decarbonization_data_integration_and_data_pipline_spark.operators.text import gopher_rules
from esg_decarbonization_data_integration_and_data_pipline_spark.tables import table

SEQ = 64
SHARDS = 4


@pytest.fixture(scope="module")
def packed(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    return pack_sequences(d, seq_len=SEQ, n_shards=SHARDS).cache()


def test_pack_offsets_are_contiguous_per_shard(packed):
    rows = packed.select("shard", "start_off", "end_off", "n_tokens") \
                 .orderBy("shard", "start_off").collect()
    pos = {}
    for r in rows:
        expect = pos.get(r["shard"], 0)
        assert r["start_off"] == expect, (r, expect)
        assert r["end_off"] - r["start_off"] == r["n_tokens"] > 0
        pos[r["shard"]] = r["end_off"]
    assert set(pos) <= set(range(SHARDS)) and len(pos) > 1


def test_pack_sequence_ids_match_offsets(packed):
    for r in packed.collect():
        assert r["first_seq"] == r["start_off"] // SEQ
        assert r["last_seq"] == (r["end_off"] - 1) // SEQ
        assert r["split_across"] == int(r["first_seq"] != r["last_seq"])


def test_pack_is_deterministic_and_total_preserving(spark, sf_dir, packed):
    d = table(spark, sf_dir, "documents")
    again = pack_sequences(d, seq_len=SEQ, n_shards=SHARDS)
    a = sorted(map(tuple, packed.collect()))
    b = sorted(map(tuple, again.collect()))
    assert a == b
    # every non-empty doc is packed exactly once
    n_docs = d.filter(F.col("text").isNotNull()).count()
    assert packed.count() == n_docs  # fixture has no zero-token texts


def test_pack_manifest_arithmetic(packed):
    man = {r["shard"]: r for r in pack_manifest(packed, SEQ).collect()}
    agg = {r["shard"]: r for r in
           packed.groupBy("shard")
                 .agg(F.count(F.lit(1)).alias("n"),
                      F.sum("n_tokens").alias("tok"),
                      F.sum("split_across").alias("sp")).collect()}
    assert set(man) == set(agg)
    for s, m in man.items():
        assert m["n_docs"] == agg[s]["n"]
        assert m["total_tokens"] == agg[s]["tok"]
        assert m["n_split_docs"] == agg[s]["sp"]
        assert m["n_full_seqs"] * SEQ + m["tail_tokens"] == m["total_tokens"]
        assert 0 <= m["tail_tokens"] < SEQ


def test_pack_rejects_bad_params(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    with pytest.raises(ValueError):
        pack_sequences(d, seq_len=0)
    with pytest.raises(ValueError):
        pack_sequences(d, n_shards=0)


def test_export_round_trip(spark, sf_dir, tmp_path):
    d = table(spark, sf_dir, "documents")
    out = str(tmp_path / "packed")
    manifest = export_packed_shards(d, out, seq_len=SEQ, n_shards=SHARDS)
    docs = spark.read.parquet(f"{out}/docs")
    # shard partition column survives, text rides along for the trainer
    assert {"shard", "doc_id", "text", "start_off"} <= set(docs.columns)
    man = {r["shard"]: r for r in manifest.collect()}
    agg = {r["shard"]: (r["n"], r["tok"]) for r in
           docs.groupBy("shard").agg(F.count(F.lit(1)).alias("n"),
                                     F.sum("n_tokens").alias("tok")).collect()}
    assert set(man) == set(agg)
    for s, (n, tok) in agg.items():
        assert man[s]["n_docs"] == n and man[s]["total_tokens"] == tok
    # shard files stream in pack order (front-to-back reconstruction)
    one = docs.filter(F.col("shard") == min(agg)).collect()
    offs = [r["start_off"] for r in one]
    assert offs == sorted(offs)


def test_temperature_alpha_zero_is_uniform(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    got = (temperature_mixture_sample(d, alpha=0.0)
           .groupBy("source").count().collect())
    counts = {r["source"]: r["count"] for r in got}
    # alpha=0 => equal weights => every source contributes the same k
    assert len(set(counts.values())) == 1 and min(counts.values()) > 0


def test_temperature_composition_tracks_sqrt_counts(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    nat = {r["source"]: r["n"] for r in
           d.filter(F.col("text").isNotNull())
            .groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    got = {r["source"]: r["count"] for r in
           temperature_mixture_sample(d, alpha=0.5)
           .groupBy("source").count().collect()}
    cap = min(math.floor(n / n ** 0.5) for n in nat.values())
    for s, n in nat.items():
        assert got[s] == math.floor(cap * n ** 0.5)


def test_temperature_rejects_negative_alpha(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    with pytest.raises(ValueError):
        temperature_mixture_sample(d, alpha=-0.1)


def test_gopher_flags_on_synthetic_rows(spark):
    rows = [
        # passes everything (>=25 words, all rules ok)
        (1, " ".join(["the", "a", "of"] + ["word"] * 30)),
        # too short
        (2, "the a tiny doc"),
        # symbol-heavy: hashes and ellipses dominate
        (3, " ".join(["the", "a"] + ["###..."] * 30)),
        # numeric words fail the alpha-ratio rule
        (4, " ".join(["the", "a"] + ["12345"] * 30)),
        # no stopwords
        (5, " ".join(["lorem"] * 30)),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in gopher_rules(df, min_words=25).collect()}
    assert got[1]["gopher_pass"] == 1
    assert got[2]["r_words"] == 0 and got[2]["gopher_pass"] == 0
    assert got[3]["r_symbol"] == 0 and got[3]["gopher_pass"] == 0
    assert got[4]["r_alpha"] == 0 and got[4]["gopher_pass"] == 0
    assert got[5]["r_stop"] == 0 and got[5]["gopher_pass"] == 0
    assert got[6]["n_words"] is None and got[6]["gopher_pass"] == 0


def test_gopher_symbol_ratio_counts_all_three_symbols(spark):
    df = spark.createDataFrame(
        [(1, "plain words only here"),
         (2, "has # and … and ... markers")],
        "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in gopher_rules(df).collect()}
    assert got[1]["symbol_ratio"] == 0.0
    assert got[2]["symbol_ratio"] == pytest.approx(round(3 / 7, 6), abs=1e-6)


def test_token_budget_matches_serial_window_any_bucketing(spark, sf_dir):
    from pyspark.sql import Window
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.sampling import (
        token_budget_sample,
    )
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.text import tokens

    d = table(spark, sf_dir, "documents")
    # serial reference: one global window
    serial = (d.filter(F.col("text").isNotNull())
               .withColumn("n_tokens", F.size(tokens()).cast("bigint"))
               .withColumn("cum_tokens", F.sum("n_tokens").over(
                   Window.orderBy(F.md5("text"), F.col("text"),
                                  F.col("doc_id"))
                         .rowsBetween(Window.unboundedPreceding,
                                      Window.currentRow)))
               .filter(F.col("cum_tokens") <= 1500)
               .select("doc_id", "n_tokens", "cum_tokens"))
    want = sorted(map(tuple, serial.collect()))
    for hx in (1, 2, 3):
        got = sorted(map(tuple,
                         token_budget_sample(d, 1500, bucket_hex=hx)
                         .select("doc_id", "n_tokens", "cum_tokens")
                         .collect()))
        assert got == want, f"bucket_hex={hx}"
    assert len(want) > 0


def test_token_budget_edges(spark, sf_dir):
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.sampling import (
        token_budget_sample,
    )

    d = table(spark, sf_dir, "documents")
    assert token_budget_sample(d, 0).count() == 0
    big = token_budget_sample(d, 10**12)
    assert big.count() == d.filter(F.col("text").isNotNull()).count()
    with pytest.raises(ValueError):
        token_budget_sample(d, -1)


def test_token_budget_plan_has_no_global_sort_on_corpus(spark, sf_dir):
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.sampling import (
        token_budget_sample,
    )

    d = table(spark, sf_dir, "documents")
    plan = token_budget_sample(d, 5000)._jdf.queryExecution() \
        .executedPlan().toString()
    # the corpus-side window must shuffle by bucket hash; the only
    # single-partition exchange feeds the tiny bucket-offset window
    assert "hashpartitioning(__bkt" in plan
    assert "rangepartitioning" not in plan.lower()


def test_drop_repeated_lines_synthetic(spark):
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.text import (
        drop_repeated_lines,
    )

    lines = spark.createDataFrame(
        [(1, 0, "unique alpha"), (1, 1, "SHARED FOOTER"),
         (1, 2, "unique beta"),
         (2, 0, "SHARED FOOTER"), (2, 1, "other text"),
         (3, 0, "SHARED FOOTER")],   # doc 3 is pure boilerplate
        "doc_id bigint, chunk_idx int, chunk_text string")
    got = {r["doc_id"]: r for r in drop_repeated_lines(lines).collect()}
    assert got[1]["clean_text"] == "unique alpha unique beta"  # order kept
    assert got[1]["n_kept_lines"] == 2 and got[1]["n_dropped_lines"] == 1
    assert got[2]["clean_text"] == "other text"
    # fully-boilerplate doc survives as empty, not absent
    assert got[3]["clean_text"] == "" and got[3]["n_kept_lines"] == 0
    # within-doc repeats alone don't count as cross-doc boilerplate
    solo = spark.createDataFrame(
        [(9, 0, "again"), (9, 1, "again")],
        "doc_id bigint, chunk_idx int, chunk_text string")
    out = drop_repeated_lines(solo).collect()[0]
    assert out["clean_text"] == "again again"


def test_pack_deterministic_under_duplicate_ids(spark):
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.packing import (
        pack_sequences,
    )

    dup = spark.createDataFrame(
        [(1, "alpha beta gamma"), (1, "delta epsilon"),
         (2, "zeta eta theta iota")],
        "doc_id bigint, text string")
    a = sorted(map(tuple, pack_sequences(dup, 4, 2).collect()))
    b = sorted(map(tuple, pack_sequences(dup, 4, 2).collect()))
    assert a == b and len(a) == 3


def test_gopher_raises_on_column_collision(spark):
    df = spark.createDataFrame([(1, "the a text", 5)],
                               "doc_id bigint, text string, n_words int")
    with pytest.raises(ValueError, match="n_words"):
        gopher_rules(df)


def test_drop_repeated_lines_null_lines_count_as_dropped(spark):
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.text import (
        drop_repeated_lines,
    )

    lines = spark.createDataFrame(
        [(1, 0, "real content"), (1, 1, None),
         (2, 0, None), (2, 1, None)],   # doc 2: all-null lines
        "doc_id bigint, chunk_idx int, chunk_text string")
    got = {r["doc_id"]: r for r in drop_repeated_lines(lines).collect()}
    assert got[1]["clean_text"] == "real content"
    assert got[1]["n_kept_lines"] == 1 and got[1]["n_dropped_lines"] == 1
    # all-null doc still present; counts sum to its input lines
    assert got[2]["clean_text"] == "" and got[2]["n_dropped_lines"] == 2


def test_dataset_diff_statuses(spark):
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.diff import dataset_diff

    old = spark.createDataFrame(
        [(1, "same"), (2, "before"), (3, "gone"), (5, None)],
        "doc_id bigint, text string")
    new = spark.createDataFrame(
        [(1, "same"), (2, "after"), (4, "fresh"), (5, None)],
        "doc_id bigint, text string")
    got = {r["doc_id"]: r["status"] for r in dataset_diff(old, new).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed",
                   4: "added", 5: "unchanged"}
    # null is distinct from empty string
    o2 = spark.createDataFrame([(9, None)], "doc_id bigint, text string")
    n2 = spark.createDataFrame([(9, "")], "doc_id bigint, text string")
    assert dataset_diff(o2, n2).collect()[0]["status"] == "changed"
    with pytest.raises(ValueError):
        dataset_diff(old.select("doc_id"), new.select("doc_id"))


def test_dataset_diff_hash_is_separator_proof(spark):
    """Fixed-width per-column digests: a changed multi-column row
    whose values merely SHIFT across a would-be separator byte (or
    equal a would-be null sentinel) must classify as changed, not
    unchanged (a concat_ws scheme hashes both sides identically and
    incremental curation would silently skip the reprocess)."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.diff import (
        dataset_diff,
    )

    schema = "doc_id bigint, a string, b string"
    old = spark.createDataFrame([(1, "x\x01y", "z"), (2, "\x00null", "k")],
                                schema)
    new = spark.createDataFrame([(1, "x", "y\x01z"), (2, None, "k")],
                                schema)
    got = {r.doc_id: r.status
           for r in dataset_diff(old, new, compare_cols=["a", "b"]).collect()}
    assert got == {1: "changed", 2: "changed"}


def test_top_fraction_exact_with_ties(spark):
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.sampling import (
        top_fraction_by_score,
    )

    df = spark.createDataFrame(
        [(1, 0.9), (2, 0.8), (3, 0.8), (4, 0.7), (5, 0.1),
         (6, None)],
        "doc_id bigint, score double")
    # ceil(5 * 0.4) = 2 rows -> cutoff 0.8, ties included -> 3 rows
    got = top_fraction_by_score(df, "score", 0.4).collect()
    assert sorted(r["doc_id"] for r in got) == [1, 2, 3]
    assert all(r["score_cutoff"] == 0.8 for r in got)
    # keep everything / nothing
    assert top_fraction_by_score(df, "score", 1.0).count() == 5
    assert top_fraction_by_score(df, "score", 0.0).count() == 0
    with pytest.raises(ValueError):
        top_fraction_by_score(df, "score", 1.5)


def test_top_fraction_is_lazy_single_job(spark):
    """The r6 verdict's extra-scan finding: k must come from
    sum(__n) inside the distinct-score aggregate, NOT a separate
    count() action -- so BUILDING the gate runs zero Spark jobs and
    the whole thing executes as one job at action time."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.sampling import (
        top_fraction_by_score,
    )

    df = spark.createDataFrame(
        [(i, float(i % 10)) for i in range(100)],
        "doc_id bigint, score double")
    sc = spark.sparkContext
    sc.setJobGroup("tf_gate_build", "laziness pin")
    try:
        gate = top_fraction_by_score(df, "score", 0.3)
    finally:
        sc.setJobGroup("", "")
    assert list(sc.statusTracker().getJobIdsForGroup("tf_gate_build")) == []
    # and it is still exact: ceil(100 * .3) = 30 -> cutoff 7.0, ties
    # included -> scores {7,8,9} x 10 rows
    got = gate.collect()
    assert len(got) == 30 and all(r["score"] >= 7.0 for r in got)


def test_token_budget_rejects_output_column_collision(spark):
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.sampling import (
        token_budget_sample,
    )

    df = spark.createDataFrame([(1, "a b", 7)],
                               "doc_id bigint, text string, n_tokens int")
    with pytest.raises(ValueError, match="n_tokens"):
        token_budget_sample(df, 10)


def test_token_budget_by_source_int_source_ids(spark):
    """Budget-frame key type follows the caller's source column
    (int domain ids, not just strings)."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.sampling import (
        token_budget_by_source,
    )

    rows = [(i, f"w{i} x y", i % 2) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source int")
    out = token_budget_by_source(df, {0: 12, 1: 6}, source_col="source")
    got = out.collect()
    assert len(got) > 0
    assert dict(out.dtypes)["source"] == "int"
    per = {}
    for r in got:
        per[r.source] = per.get(r.source, 0) + r.n_tokens
    assert per.get(0, 0) <= 12 and per.get(1, 0) <= 6


def test_pack_plan_single_shard_exchange(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    plan = pack_sequences(d, seq_len=256, n_shards=8)._jdf \
        .queryExecution().executedPlan().toString()
    # one hash exchange keyed by shard feeds the window; never a
    # global sort (rangepartitioning) at any corpus size
    assert "hashpartitioning(shard" in plan
    assert "rangepartitioning" not in plan.lower()


def test_export_empty_corpus_yields_empty_manifest(spark, tmp_path):
    empty = spark.createDataFrame([], "doc_id bigint, text string")
    man = export_packed_shards(empty, str(tmp_path / "e"), seq_len=SEQ,
                               n_shards=2)
    assert man.count() == 0
    assert {"shard", "n_docs", "total_tokens"} <= set(man.columns)


def test_token_budget_by_source_matches_serial_per_source(spark, sf_dir):
    from pyspark.sql import Window
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.sampling import (
        token_budget_by_source,
    )
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.text import tokens

    d = table(spark, sf_dir, "documents")
    srcs = sorted(r[0] for r in d.select("source").distinct().collect())[:2]
    budgets = {srcs[0]: 400, srcs[1]: 150}
    serial = (d.filter(F.col("text").isNotNull()
                       & F.col("source").isin(srcs))
               .withColumn("n_tokens", F.size(tokens()).cast("bigint"))
               .withColumn("cum_tokens", F.sum("n_tokens").over(
                   Window.partitionBy("source")
                         .orderBy(F.md5("text"), F.col("text"),
                                  F.col("doc_id"))
                         .rowsBetween(Window.unboundedPreceding,
                                      Window.currentRow))))
    want = sorted((r.doc_id, r.cum_tokens) for r in serial.collect()
                  if r.cum_tokens <= budgets[r.source])
    got = sorted((r.doc_id, r.cum_tokens) for r in
                 token_budget_by_source(d, budgets).collect())
    assert got == want and len(got) > 0
    # per-source budget respected exactly
    per_src = {}
    for r in token_budget_by_source(d, budgets).collect():
        per_src[r.source] = per_src.get(r.source, 0) + r.n_tokens
    for s, tot in per_src.items():
        assert tot <= budgets[s]


def test_token_budget_by_source_rejects_bad_budgets(spark, sf_dir):
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.sampling import (
        token_budget_by_source,
    )

    d = table(spark, sf_dir, "documents")
    with pytest.raises(ValueError):
        token_budget_by_source(d, {})
    with pytest.raises(ValueError):
        token_budget_by_source(d, {"src0": -1})
