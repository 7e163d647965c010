#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with the noop sink (full execution,
no driver-side collect bottleneck) -- the honest way to time a
distributed plan. Each query runs BENCH_SAMPLES (default 3) times
with the cache cleared in between; the recorded per-query number and
the headline total are MEDIANS (single samples swing +/-30% on this
box), with per-query min and raw samples alongside.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd  # module-level: pandas_udf resolves stringized type hints here

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from esg_decarbonization_data_integration_and_data_pipline_spark.session import get_spark  # noqa: E402
from esg_decarbonization_data_integration_and_data_pipline_spark.plans.queries import REGISTRY  # noqa: E402

HEADLINE = [
    "pricing_summary",
    "ytm_running_sum",
    "rollup_region_nation",
    "brand_revenue",
    "asof_latest_order_at_event",
    "latest_order_per_customer",
    "unpivot_lineitem_measures",
    "fill_missing_part_revenue",
    "multi_key_order_lines",
    "monthly_order_calendar",
    # training-data-pipeline surface (scale paths, not the exact
    # quadratic verifiers)
    "text_fingerprint",
    "text_quality",
    "dedup_minhash_verified",
    "similarity_topk",
    "similarity_lsh_buckets",
    "similarity_ivf_topk",
    "events_tumbling_agg",
    # added round 8 (r7 verdict task #5): both are curation-pipeline
    # gates since r7 and were invisible to per-round bench deltas.
    # r8-vs-r7 total comparisons must subtract these two entries --
    # the prior 17-query set is the comparable prefix.
    "text_normalize_docs",
    "decontaminate_spans_docs",
    # added round 9: the two new head-graded curation ops (same
    # discipline -- totals compare on the 17-query prefix, reported
    # separately via prefix17_total/prefix17_min)
    "pii_redact_docs",
    "dedup_bloom_incremental",
    # added late round 9: the session's new head-graded tiers
    # (retrieval, data-quality, drift); same prefix17 discipline
    "bm25_retrieval_docs",
    "data_quality_report",
    "drift_orders_psi",
    # added round 10: the two new head-graded queries (cost-routed
    # versioned-table audit incl. its three fixture commits, and the
    # one-row drift summaries); totals compare on the prefix17 and
    # prefix24 series
    "versioned_table_audit",
    "drift_ks_summary",
    # added round 11: the four lakehouse audits over the SHARED
    # memoized fixture (plans/fixtures.py) -- the first query to run
    # pays the 3-commit build once, every later sample/query reuses
    # it (versioned_table_audit's r10 fixture-build overhead moved
    # there too).  Totals compare on prefix17/prefix24/prefix26.
    "purge_erasure_audit",
    "constraints_history_audit",
    "ddl_timetravel_audit",
    "bloom_point_lookup_orders",
    # added round 11: the SCD2 tier -- the dim build is the memoized
    # shared fixture (first query to run pays it), the fact join is
    # the equi-join + residual-interval plan over it
    "scd2_customer_history",
    "scd2_asof_fact_join",
    # added round 11: zero-copy shallow clone + COW divergence (the
    # clone itself is one manifest write; the audit's read-back and
    # the keyed delete are what cost)
    "clone_divergence_audit",
    # added round 11: lakehouse fsck (footer-truth verification of
    # the healthy fixture + a tampered copy; one executor-parallel
    # footer job per table)
    "fsck_report_audit",
    # added round 12: the Python-DataSource face (time travel reads
    # every fixture version through format('versioned_table') --
    # deliberately measuring the documented ~3.7x Arrow-transfer
    # cost; the stream audit drains the whole fixture through the
    # engine-checkpointed tail) and the vacuum/clone retention
    # audit (compaction + vacuum + clone reads dominate).  Totals
    # compare on prefix17/prefix24/prefix26; prefix34 is this
    # round's new extended series.
    "datasource_timetravel_audit",
    "datasource_stream_tail_audit",
    "vacuum_retention_audit",
    # added round 12: the row-level change feed (readChangeFeed) --
    # stream drain of the full fixture history + the batch CDF face;
    # the v3 delete's executor-side multiset diff is the cost
    "datasource_cdf_audit",
    # added round 12: filter pushdown through the format() face --
    # the clustering compaction + bloom build dominate; the five
    # pruned probes are the measured contract
    "datasource_pushdown_audit",
    # added round 12: the write face -- three batch commits + a
    # 2-drain exactly-once streaming sink, all Arrow-staged
    "datasource_write_audit",
    # added round 12 (late): zero-copy column rename (column
    # mapping) -- the rename is one metadata commit; the five-version
    # read-back plus the metadata-answered count_where per version is
    # the measured contract
    "rename_column_audit",
    # added round 12 (late): deletion vectors -- two sidecar-only
    # delete commits + an append; the six-version read-back (dv
    # anti-joins on versions 4-6) and the metadata rowcounts are the
    # measured contract
    "dv_delete_audit",
    # added round 13: the r13 head tiers -- the frozen-merge BPE
    # encoder (one Arrow kernel pass over every document), Hive-
    # partitioned layout pruning (the snapshot build is memoized;
    # the three pruned reads are the measured contract), and the
    # metadata-answered aggregates (zero-/boundary-scan by
    # construction).  Totals compare on prefix17/24/26/34; the full
    # r12 42-query set is pinned as prefix42.
    "bpe_encode_docs",
    "partition_pruning_audit",
    "metadata_aggregates_audit",
    # added round 13 (late): dynamic partition overwrite -- the
    # memoized build pays the partitioned load + two replace commits
    # once; the graded read-back (current + time travel) is measured
    "replace_partitions_audit",
    # added round 14: the writer-face dynamic partition overwrite
    # twin (memoized build: writer load + dynamic reload + replay +
    # refusal; measured = the two format() reads) and the graded BPE
    # TRAINER (one corpus scan -> vocab-sized driver merge loop ->
    # one Arrow encode pass; the whole pipeline is the measured
    # contract).  Totals compare on prefix17/24/26/34/42; the r13
    # 46-query set is prefix46.
    "writer_replace_audit",
    "bpe_tokenize_docs",
    # added round 14 (late): hidden partitioning -- the two
    # transform-layout builds are memoized; the measured contract is
    # the three pruned reads (function range, pushdown range, bucket
    # equality)
    "hidden_partition_audit",
    # added round 14 (late): exact-substring dedup (ExactSubstr,
    # rolling-window) -- one gram-hash exchange (16-byte md5 keys)
    # carrying every occurrence, then occurrence-bounded island
    # merge; the excision variant adds the corpus-sized token-filter
    # rebuild.  prefix49 pins the r14 set before these two.
    "exact_substring_spans_docs",
    "exact_substring_dedup_docs",
    # added round 14 (late): Z-order data skipping -- the
    # unclustered write + OPTIMIZE ZORDER build is memoized; the
    # measured contract is the three pruned reads (two 1-D ranges +
    # the 2-D tile conjunction)
    "zorder_pruning_audit",
    # added round 14 (late): conditional multi-clause MERGE -- the
    # snapshot + two merge commits are memoized; the measured
    # contract is the three version read-backs
    "merge_clauses_audit",
    # added round 14 (late): metadata-answered NDV -- the copy +
    # per-file HLL sidecar builds are memoized; the measured
    # contract is nine zero-job register merges + three exact
    # count-distinct anchor jobs
    "ndv_metadata_audit",
    # added round 15: the now-hash-graded sketch query (one-scan
    # distributed HLL via hll_group_ndv + exact percentiles) and the
    # histogram metadata tier (copy + sidecar builds memoized; the
    # measured contract is eighteen zero-job quantile/range walks +
    # three exact range-count anchor jobs).  prefix54 pins the r14
    # close set ahead of these two.
    "approx_sketches",
    "histogram_quantile_audit",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("decarb-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM/codegen path once so timings measure the plans,
    # not first-query classloading
    REGISTRY["pricing_summary"].fn(spark, sf_dir).write.format("noop") \
        .mode("overwrite").save()
    # ...and fork the Python/Arrow workers once -- with numpy touched
    # INSIDE the udf, because the kernels import numpy lazily in the
    # worker and a numpy-less warmup leaves ~0.3 s of import cost in
    # the first sampled pandas-UDF query (measured r6). 2x
    # parallelism partitions so every pooled worker gets warmed.
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _warm(s: pd.Series) -> pd.Series:
        import numpy as np

        return pd.Series(np.asarray(s.values, dtype="float64"))

    par = spark.sparkContext.defaultParallelism
    (spark.range(2 * par).repartition(2 * par)
          .withColumn("x", _warm(F.col("id").cast("double")))
          .write.format("noop").mode("overwrite").save())

    names = [n for n in HEADLINE if n in REGISTRY]
    extra = os.environ.get("BENCH_QUERIES")
    subset = bool(extra)
    if extra:
        names = [n for n in extra.split(",") if n in REGISTRY]
    n_samples = max(1, int(os.environ.get("BENCH_SAMPLES", "3")))

    # Pre-build the process-memoized SHARED fixtures in the warmup
    # phase (r16; r15 verdict item 4 -- a declared measurement fix):
    # whichever audit ran first paid the whole cohort's fixture build
    # in its sample 1 (versioned_table_audit's driver samples were
    # [7.6, 3.0, 6.0] -- build cost, not read cost, drowning its
    # median).  Every cold process still pays the build, just outside
    # the per-query timed samples -- the same setup-vs-read split the
    # per-query audit_state builders already apply.  Per-query
    # audit_state mutation phases still land in their own query's
    # sample 1, unchanged.
    _FIXTURE_USERS = {"versioned_table_audit", "purge_erasure_audit",
                      "constraints_history_audit",
                      "ddl_timetravel_audit",
                      "bloom_point_lookup_orders",
                      "clone_divergence_audit", "fsck_report_audit",
                      "dv_delete_audit", "rename_column_audit",
                      "ndv_metadata_audit", "histogram_quantile_audit"}
    from esg_decarbonization_data_integration_and_data_pipline_spark.plans import fixtures as _fx
    if _FIXTURE_USERS & set(names):
        _fx.orders_versioned_fixture(spark, sf_dir)
    if {"scd2_customer_history", "scd2_asof_fact_join"} & set(names):
        _fx.scd2_customer_fixture(spark, sf_dir)

    # n=3 samples per query with the cache cleared in between:
    # BENCH_LOG shows +/-30% single-sample noise on untouched code
    # round over round, so the per-query MEDIAN is the recorded
    # number (min kept alongside as the contention-free floor).
    # clearCache() between samples keeps repeats honest for
    # cache-using plans (they re-run their kernels), while codegen/
    # JIT stays warm -- so sample 1 carries the one-time compile cost
    # and the median reflects the plan's steady-state cost, which is
    # what a long-lived cluster session pays.
    # per-query fault isolation: one broken plan must not erase the
    # timings of every healthy query (the whole point of a benchmark)
    timings: dict[str, float] = {}
    minimums: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    jobs: dict[str, int] = {}
    errors: dict[str, str] = {}
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    for name in names:
        runs: list[float] = []
        for i in range(n_samples):
            spark.catalog.clearCache()
            # job-count evidence (r16; r15 verdict item 7): each
            # sample runs under its own job group so the recorded
            # count is machine-checkable, not prose.  The LAST
            # sample's count is recorded -- sample 1 may carry
            # one-time memoized fixture builds.
            group = f"bench:{name}:{i}"
            sc.setJobGroup(group, name)
            t0 = time.time()
            try:
                REGISTRY[name].fn(spark, sf_dir).write.format("noop") \
                    .mode("overwrite").save()
            except Exception as exc:  # noqa: BLE001 -- record, continue
                errors[name] = f"{type(exc).__name__}: {exc}"[:500]
                print(f"bench: {name} FAILED: {errors[name]}",
                      file=sys.stderr)
                break
            runs.append(round(time.time() - t0, 3))
            try:
                jobs[name] = len(tracker.getJobIdsForGroup(group))
            except Exception:  # noqa: BLE001 -- annotation only
                pass
        if not runs or name in errors:
            continue
        runs_sorted = sorted(runs)
        timings[name] = runs_sorted[len(runs_sorted) // 2]
        minimums[name] = runs_sorted[0]
        samples[name] = runs

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    # variance guard (r8->r9): three fresh-session runs of the SAME
    # binary spanned 10.37-11.29 s on the 17-query prefix (8.9% of
    # min; BENCH_LOG ts 1786747323/1786748119/1786748186), which
    # brackets the r7-vs-r8 "drift" entirely -- round-over-round
    # medians within ~10% are session noise, not regressions.  Two
    # fields make that callable from a single entry: the stable
    # comparable prefix total, and the intra-run sample dispersion.
    # the comparable prefix IS the headline's first 17 entries; new
    # queries append to HEADLINE, so deriving (instead of copying)
    # keeps the cross-round number alive by construction -- if a
    # future round reorders the early HEADLINE, this line is the one
    # place the comparability contract lives
    # declared comparable prefixes: (length, pinned last entry).
    # prefix17 = the r1-r8 set; prefix24 adds the r9 tiers (r9
    # verdict task #3) so r11+ has a two-round window for them.  New
    # rounds APPEND to HEADLINE and, when they grow it, declare one
    # more (length, sentinel) pair here -- one loop, no copied blocks
    PREFIXES = [(17, "events_tumbling_agg"), (24, "drift_orders_psi"),
                (26, "drift_ks_summary"), (34, "fsck_report_audit"),
                (42, "dv_delete_audit"),
                (46, "replace_partitions_audit"),
                (49, "hidden_partition_audit"),
                (54, "ndv_metadata_audit")]
    for plen, sentinel in PREFIXES:
        assert len(HEADLINE) >= plen and HEADLINE[plen - 1] == sentinel, \
            f"HEADLINE's first {plen} entries are a cross-round " \
            f"comparable prefix ending at {sentinel} -- append new " \
            f"queries, don't reorder the head"
    spreads = sorted(
        100.0 * (max(r) - min(r)) / (sorted(r)[len(r) // 2] or 1.0)
        for r in samples.values() if len(r) > 1)
    # the printed ONE-LINE JSON must stay well inside the driver's
    # capture limit -- BENCH_r14's captured output truncated mid-JSON
    # and cost round 15 its whole cross-round PERF comparison (r15
    # verdict item 8).  Raw per-sample lists (~6 KB and growing with
    # the headline set) now live only in the repo-side BENCH_LOG.jsonl
    # line; the printed line keeps medians, mins and job counts.
    # Declared measurement-format fix: no timing or methodology
    # change, keys are only dropped from stdout, never from the log.
    out: dict = {
        # a subset run (BENCH_QUERIES) is not a headline total; a
        # distinct metric name + flag keep trend readers honest
        # (r15 ADVICE)
        "metric": ("headline_queries_subset" if subset
                   else "headline_queries_total"),
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,          # per-query MEDIAN of n samples
        "queries_min": minimums,     # per-query best sample
        "jobs": jobs,                # Spark jobs in the LAST sample
        "sf": sf_val,
        # annotation only (r15): the driver also runs this bench at
        # lower core counts, and a BENCH_LOG line without the core
        # count is not comparable round-over-round.  Stable type
        # (r15 ADVICE): int when numeric, null otherwise.
        "cpus": int(cpus) if str(cpus).isdigit() else None,
    }
    if subset:
        out["subset"] = True
    for plen, _sentinel in PREFIXES:
        prefix = HEADLINE[:plen]
        if all(q in timings for q in prefix):
            out[f"prefix{plen}_total"] = round(
                sum(timings[q] for q in prefix), 3)
            out[f"prefix{plen}_min"] = round(
                sum(minimums[q] for q in prefix), 3)
    if spreads:
        out["sample_spread_pct"] = round(spreads[len(spreads) // 2], 1)
    if errors:
        # a failing query drops out of the sum, which would make the
        # headline FASTER than a healthy run -- mark the total
        # incomparable so a broken plan can never read as a perf win
        out["value"] = None
        out["errors"] = errors
    print(json.dumps(out))
    # repo-side perf journal: append per-run timings so regressions
    # are visible across rounds without the driver's bench artifacts.
    # (BENCH_LOG.jsonl, not PROGRESS.jsonl -- the latter is the
    # driver's own heartbeat file.)
    try:
        with open(os.path.join(REPO, "BENCH_LOG.jsonl"), "a") as fh:
            fh.write(json.dumps({"ts": round(time.time()), **out,
                                 "samples": samples}) + "\n")
    except OSError:
        pass  # never let journaling break the bench contract


if __name__ == "__main__":
    main()
