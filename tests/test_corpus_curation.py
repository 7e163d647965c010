"""End-to-end corpus curation over the fixture documents table."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import sf_sibling

from esg_decarbonization_data_integration_and_data_pipline_spark.pipelines.corpus_curation import curate, curate_and_export

SF = sf_sibling("sf0.01")


def test_curate_end_to_end(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = curate(docs, min_quality=0.3, near_dup_threshold=0.5).cache()
    n = out.count()
    assert 0 < n <= docs.count()
    # every row carries the full curation verdict
    row = out.first()
    assert row.predicted_lang is not None and row.split in (
        "train", "eval", "test", "holdout")
    # cluster invariants: each cluster has exactly one canonical doc,
    # and it is the min id
    per_cluster = (out.groupBy("cluster_id")
                   .agg(F.sum(F.col("is_canonical").cast("int")).alias("k"),
                        F.min("doc_id").alias("lo")))
    assert per_cluster.filter("k <> 1").count() == 0
    canon = {r.cluster_id: r.doc_id
             for r in out.filter("is_canonical").collect()}
    lows = {r.cluster_id: r.lo for r in per_cluster.collect()}
    assert canon == lows
    # near-dups clustered: the fixture corpus has verified pairs, so
    # at least one multi-doc cluster exists and its members share a split
    multi = (out.groupBy("cluster_id").count().filter("count > 1"))
    assert multi.count() > 0
    out.unpersist()


def test_curate_quality_gate_filters(spark):
    docs = spark.createDataFrame(
        [(1, "the of and to in is a good long document " * 5),
         (2, "x")],                       # degenerate: fails the gate
        "doc_id bigint, text string")
    out = curate(docs, min_quality=0.3)
    assert [r.doc_id for r in out.collect()] == [1]


def test_curate_repetition_gate_filters(spark):
    varied = ("the of and to in is a good long document with many "
              "different words appearing once each time here")
    spammy = "the of and to in is spam " * 20   # one phrase repeated 20x
    docs = spark.createDataFrame(
        [(1, varied), (2, spammy)], "doc_id bigint, text string")
    # spammy passes quality (stopword-rich, long) but its duplicate-
    # bigram ratio is ~0.95 -- the repetition gate drops it
    out = curate(docs, min_quality=0.3, max_repetition=0.9)
    assert [r.doc_id for r in out.collect()] == [1]
    # gate disabled -> both survive
    both = curate(docs, min_quality=0.3, max_repetition=None)
    assert sorted(r.doc_id for r in both.collect()) == [1, 2]


def test_curate_scrub_redacts_and_dedups_together(spark):
    """Two docs differing only in redacted emails scrub to identical
    text, so they dedup into one cluster and share a split."""
    base = ("contact us about the good long document with many "
            "different words appearing once each and again here ")
    docs = spark.createDataFrame(
        [(1, base + "mail alice@example.com now"),
         (2, base + "mail bob@other.org now")],
        "doc_id bigint, text string")
    out = curate(docs, min_quality=0.0, near_dup_threshold=0.5).cache()
    rows = {r.doc_id: r for r in out.collect()}
    assert "@" not in rows[1].text and "<EMAIL>" in rows[1].text
    assert rows[1].cluster_id == rows[2].cluster_id
    assert rows[1].split == rows[2].split
    unscrubbed = curate(docs, min_quality=0.0, scrub=False)
    assert "@" in unscrubbed.filter("doc_id = 1").first().text
    out.unpersist()


def test_curate_normalize_dedups_whitespace_variants_together(spark):
    """With normalize=True, two docs differing only in line endings /
    whitespace runs normalize to identical text, so they dedup into
    one cluster and share a split; off by default, they stay textually
    distinct."""
    base = ("contact us about the good long document with many\n"
            "different words appearing once each and again here soon")
    variant = (base.replace(" about ", "   about ")
                   .replace("\n", " \r\n ") + "  ")
    docs = spark.createDataFrame(
        [(1, base), (2, variant)], "doc_id bigint, text string")
    out = curate(docs, min_quality=0.0, near_dup_threshold=0.5,
                 normalize=True).cache()
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[1].text == rows[2].text  # one canonical spelling
    assert "\r" not in rows[2].text and "   " not in rows[2].text
    assert rows[1].cluster_id == rows[2].cluster_id
    assert rows[1].split == rows[2].split
    raw = curate(docs, min_quality=0.0, near_dup_threshold=0.5)
    t2 = raw.filter("doc_id = 2").first().text
    assert "\r" in t2  # default leaves the trainer-visible text alone
    out.unpersist()


def test_curate_entropy_gate_filters(spark):
    varied = ("the of and to in is a good long document with many "
              "different words appearing once each time here")
    docs = spark.createDataFrame(
        [(1, varied), (2, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa")],
        "doc_id bigint, text string")
    out = curate(docs, min_quality=0.0, max_repetition=None,
                 min_entropy=2.0)
    assert [r.doc_id for r in out.collect()] == [1]


def test_curate_boilerplate_gate_filters(spark):
    chrome = "all rights reserved terms of service apply here"
    uniq = ["many different words appearing once each time around",
            "an actual document body with its own novel content",
            "substantive text that shares nothing with the chrome"]
    rows = [(i + 1, f"{u} {chrome}") for i, u in enumerate(uniq)]
    rows.append((4, chrome))            # pure chrome: share ~1
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = curate(docs, min_quality=0.0, max_repetition=None,
                 max_boilerplate=0.8, boilerplate_min_docs=3)
    assert sorted(r.doc_id for r in out.collect()) == [1, 2, 3]


def test_curate_decontamination_filters(spark):
    eval_q = ("what is the capital of the example country "
              "in this benchmark question")
    clean = ("a perfectly ordinary training document with plenty "
             "of its own words and no overlap at all")
    docs = spark.createDataFrame(
        [(1, clean), (2, f"leaked text: {eval_q} and more")],
        "doc_id bigint, text string")
    bench = spark.createDataFrame([(100, eval_q)],
                                  "doc_id bigint, text string")
    out = curate(docs, min_quality=0.0, max_repetition=None,
                 benchmark=bench, decontam_n=5)
    assert [r.doc_id for r in out.collect()] == [1]
    no_bench = curate(docs, min_quality=0.0, max_repetition=None)
    assert sorted(r.doc_id for r in no_bench.collect()) == [1, 2]


def test_curate_all_gates_sf01_end_to_end(spark):
    """Full pipeline -- scrub + quality + repetition + entropy +
    boilerplate + decontamination + dedup + split -- over the sf0.1
    documents table (the scale smoke the small gate tests can't
    give). Wall time is recorded in SCALE.md."""
    import time
    docs = spark.read.parquet(sf_sibling("sf0.1") + "/documents.parquet")
    # benchmark: a small deterministic eval slice, disjoint ids
    bench = (docs.filter(F.col("doc_id") % 97 == 0)
                 .select((F.col("doc_id") + 10_000_000).alias("doc_id"),
                         "text"))
    t0 = time.monotonic()
    # boilerplate_min_docs=100 (2% of corpus): "chrome" means grams
    # shared by MANY docs; min_docs=2 would flag near-dup grams the
    # dedup stage owns (measured: share 1.0 everywhere at min_docs=2
    # on this corpus, 0.0 at min_docs=100)
    out = curate(docs, min_quality=0.3, max_repetition=0.9,
                 min_entropy=2.0, max_boilerplate=0.9,
                 boilerplate_min_docs=100,
                 benchmark=bench, near_dup_threshold=0.5).cache()
    n = out.count()
    wall = time.monotonic() - t0
    total = docs.count()
    assert 0 < n < total
    # gates actually fired: decontamination alone must drop the
    # corpus twins of every benchmark doc (they share all n-grams)
    assert out.filter(F.col("doc_id") % 97 == 0).count() == 0
    # scrub fired: no raw emails survive in curated text
    assert out.filter(F.col("text").rlike(
        "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+")).count() == 0
    per_cluster = (out.groupBy("cluster_id")
                   .agg(F.sum(F.col("is_canonical").cast("int")).alias("k")))
    assert per_cluster.filter("k <> 1").count() == 0
    print(f"\ncurate sf0.1: {total} -> {n} docs in {wall:.2f}s")
    out.unpersist()
    spark.catalog.clearCache()


def test_curate_nll_gate_filters(spark):
    common = [(i, "the quick brown fox jumps over the lazy dog")
              for i in range(1, 9)]
    rare = [(100, "zxqv wkjy pqmn vbxz qqzz")]
    docs = spark.createDataFrame(common + rare,
                                 "doc_id bigint, text string")
    scores = {r.doc_id: r.nll for r in __import__(
        "esg_decarbonization_data_integration_and_data_pipline_spark.operators.text",
        fromlist=["unigram_nll"]).unigram_nll(docs).collect()}
    cut = (scores[1] + scores[100]) / 2
    out = curate(docs, min_quality=0.0, max_repetition=None,
                 max_nll=cut)
    assert 100 not in {r.doc_id for r in out.collect()}
    assert 1 in {r.doc_id for r in out.collect()}


def test_curation_funnel_counts(spark):
    docs = spark.createDataFrame(
        [(1, "the of and to in is a good long document with many "
             "different words appearing once each time here"),
         (2, "x"),                                   # fails quality
         (3, "the of and to in is spam " * 20)],     # fails repetition
        "doc_id bigint, text string")
    funnel = __import__(
        "esg_decarbonization_data_integration_and_data_pipline_spark.pipelines.corpus_curation",
        fromlist=["curation_funnel"]).curation_funnel(
        docs, min_quality=0.3, max_repetition=0.9, min_entropy=2.0)
    stages = dict(funnel)
    assert [s for s, _ in funnel] == ["input", "quality", "repetition",
                                      "entropy"]
    assert stages["input"] == 3
    assert stages["quality"] == 2
    assert stages["repetition"] == 1
    assert stages["entropy"] == 1


def test_curation_funnel_mirrors_normalize(spark):
    """Funnel counts must see the SAME pre-gate text rewrites as
    curate: a doc whose entropy only fails on the normalized text
    (control-char padding stripped) must count identically in both."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.pipelines.corpus_curation import (
        curation_funnel,
    )

    # raw text: low-entropy 'aaaa...' padded with control chars that
    # RAISE its raw entropy above the gate; normalization strips them
    noisy = "aaaa " * 30 + "\x00\x01\x02\x03\x04\x05\x06\x07\x0b\x0c"
    good = ("the of and to in is a good long document with many "
            "different words appearing once each time here")
    docs = spark.createDataFrame([(1, good), (2, noisy)],
                                 "doc_id bigint, text string")
    plain = dict(curation_funnel(docs, min_quality=0.0, min_entropy=1.2,
                                 max_repetition=None))
    normed = dict(curation_funnel(docs, min_quality=0.0, min_entropy=1.2,
                                  max_repetition=None, normalize=True))
    assert plain["entropy"] == 2      # control noise inflates entropy
    assert normed["entropy"] == 1     # normalized text fails the gate
    kept = curate(docs, min_quality=0.0, min_entropy=1.2,
                  max_repetition=None, normalize=True,
                  near_dup_threshold=0.5)
    assert kept.count() == normed["entropy"]  # funnel == data path


def test_curate_normalize_transforms_benchmark_like_corpus(spark):
    """Like-with-like: under normalize=True the benchmark runs the
    same normalization, so an eval span whose raw text differs only
    in control chars / whitespace runs still decontaminates."""
    # span exactly decontam_n tokens long, noise on the MIDDLE token:
    # every benchmark 5-gram then contains the noisy token, so raw
    # grams can never match while normalized grams always do
    span = "the secret eval answer is"
    corpus_doc = ("a long clean training document containing " + span
                  + " plus plenty of other words to stay past gates")
    noisy_bench = span.replace(" eval ", " \x07eval\x07  ")
    docs = spark.createDataFrame([(1, corpus_doc)],
                                 "doc_id bigint, text string")
    bench = spark.createDataFrame([(900, noisy_bench)],
                                  "doc_id bigint, text string")
    dropped = curate(docs, min_quality=0.0, max_repetition=None,
                     benchmark=bench, decontam_n=5, normalize=True,
                     near_dup_threshold=0.5)
    assert dropped.count() == 0  # contamination caught through the noise
    kept = curate(docs, min_quality=0.0, max_repetition=None,
                  benchmark=bench, decontam_n=5,
                  near_dup_threshold=0.5)
    assert kept.count() == 1  # raw benchmark grams never match


def test_curation_funnel_rejects_unknown_kwargs(spark):
    import pytest as _pytest

    from esg_decarbonization_data_integration_and_data_pipline_spark.pipelines.corpus_curation import (
        curation_funnel,
    )

    docs = spark.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
    with _pytest.raises(TypeError):
        curation_funnel(docs, min_entrophy=2.0)  # typo'd gate name


def test_curate_gopher_gate_filters(spark):
    good = ("the of and to in is a good long document with many "
            "different words appearing here to clear the floor " * 3)
    symbolic = ("the a of " + "#### " * 40)   # symbol-heavy
    docs = spark.createDataFrame(
        [(1, good), (2, symbolic)], "doc_id bigint, text string")
    out = curate(docs, min_quality=0.0, max_repetition=None,
                 gopher={"min_words": 25})
    assert [r.doc_id for r in out.collect()] == [1]
    # gate off -> both survive
    both = curate(docs, min_quality=0.0, max_repetition=None)
    assert sorted(r.doc_id for r in both.collect()) == [1, 2]


def test_curate_and_export_round_trip(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = str(tmp_path / "export")
    manifest = curate_and_export(
        docs, out, seq_len=64, n_shards=2,
        min_quality=0.3, near_dup_threshold=0.5)
    man = manifest.collect()
    assert 0 < len(man) <= 2
    packed = spark.read.parquet(f"{out}/docs")
    # only canonical train docs were exported
    assert packed.filter("split <> 'train'").count() == 0
    assert packed.filter("NOT is_canonical").count() == 0
    # manifest totals agree with the written shards
    agg = {r["shard"]: (r["n"], r["tok"]) for r in
           packed.groupBy("shard")
                 .agg(F.count(F.lit(1)).alias("n"),
                      F.sum("n_tokens").alias("tok")).collect()}
    for r in man:
        assert agg[r["shard"]] == (r["n_docs"], r["total_tokens"])


def test_curation_funnel_reports_gopher_stage(spark):
    docs = spark.createDataFrame(
        [(1, "the of and to in is a good long document with many "
             "different words appearing here to clear the floor " * 3),
         (2, "tiny the a doc")],
        "doc_id bigint, text string")
    from esg_decarbonization_data_integration_and_data_pipline_spark.pipelines.corpus_curation import (
        curation_funnel,
    )

    funnel = curation_funnel(docs, min_quality=0.0, max_repetition=None,
                             gopher={"min_words": 25})
    stages = [s for s, _ in funnel]
    assert stages == ["input", "quality", "gopher"]
    counts = dict(funnel)
    assert counts["input"] == 2 and counts["gopher"] == 1


def test_rejection_audit_attributes_first_failing_gate(spark):
    """rejection_audit: each rejected doc appears exactly ONCE, under
    the FIRST gate it vanished from; survivors produce no row. Doc 2
    fails quality AND entropy -> attributed to quality (earlier)."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.pipelines.corpus_curation import (
        rejection_audit,
    )

    docs = spark.createDataFrame(
        [(1, "the of and to in is a good long document with many "
             "different words appearing once each time here"),
         (2, "x"),                                   # quality AND entropy
         (3, "the of and to in is spam " * 20)],     # repetition
        "doc_id bigint, text string")
    audit = {r.doc_id: r.rejected_at for r in rejection_audit(
        docs, min_quality=0.3, max_repetition=0.9,
        min_entropy=2.0).collect()}
    assert audit == {2: "quality", 3: "repetition"}


def test_rejection_audit_matches_funnel_counts(spark):
    """Cross-check against curation_funnel on the fixture corpus: the
    per-stage audit row counts must equal the funnel's per-stage
    drops, and input - len(audit) must equal the final funnel
    count (both derive from the same _gate_steps chain)."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.pipelines.corpus_curation import (
        curation_funnel, rejection_audit,
    )

    docs = (spark.read.parquet(f"{SF}/documents.parquet")
            .limit(200).localCheckpoint())
    kwargs = dict(min_quality=0.3, max_repetition=0.9, min_entropy=2.0,
                  max_boilerplate=0.8)
    funnel = curation_funnel(docs, **kwargs)
    audit = rejection_audit(docs, **kwargs)
    by_stage = {r["rejected_at"]: r["n"] for r in
                audit.groupBy("rejected_at")
                     .agg(F.count(F.lit(1)).alias("n")).collect()}
    prev = None
    for stage, n in funnel:
        if stage == "input":
            prev = n
            continue
        assert by_stage.get(stage, 0) == prev - n, stage
        prev = n
    assert docs.count() - audit.count() == funnel[-1][1]
    # every rejected id is attributed at most once
    assert audit.count() == audit.select("doc_id").distinct().count()


def test_split_leakage_report_flags_straddling_clusters(spark):
    """The report lists every member of every cluster spanning >1
    split, and nothing else -- checked on a hand-built curated frame
    (deterministic, no hash hunting)."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.pipelines.corpus_curation import (
        split_leakage_report,
    )

    curated = spark.createDataFrame(
        [(1, 1, True, "train"), (2, 1, False, "eval"),   # leaks
         (3, 3, True, "train"), (4, 3, False, "train"),  # consistent
         (5, 5, True, "test")],                          # singleton
        "doc_id bigint, cluster_id bigint, is_canonical boolean, "
        "split string")
    rows = split_leakage_report(curated).collect()
    assert sorted(r.doc_id for r in rows) == [1, 2]
    assert all(r.cluster_id == 1 and r.n_splits == 2 for r in rows)


def test_cluster_consistent_splits_eliminate_leakage(spark):
    """curate(cluster_consistent_splits=True): every near-dup cluster
    shares one split (leakage report empty), canonicals keep their
    min-id invariant, and the doc set matches the default run (the
    flag only re-keys the split hash)."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.pipelines.corpus_curation import (
        split_leakage_report,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = curate(docs, min_quality=0.3, near_dup_threshold=0.5,
                 cluster_consistent_splits=True).cache()
    assert split_leakage_report(out).count() == 0
    # same survivors as the default keying
    base = curate(docs, min_quality=0.3, near_dup_threshold=0.5)
    assert (out.select("doc_id").subtract(base.select("doc_id")).count()
            == 0)
    assert out.count() == base.count()
    # canonical invariant survives the window rewrite
    per_cluster = (out.groupBy("cluster_id")
                   .agg(F.sum(F.col("is_canonical").cast("int")).alias("k")))
    assert per_cluster.filter("k <> 1").count() == 0
    out.unpersist()
