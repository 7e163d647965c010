"""Property-based invariants for the core operators (hypothesis).

Each property runs a brute-force Python model against the Spark
operator on small random inputs -- the invariant-checking layer the
reference lacks entirely (SURVEY.md §5)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from esg_decarbonization_data_integration_and_data_pipline_spark.operators.joins import asof_join
from esg_decarbonization_data_integration_and_data_pipline_spark.operators.rollup import rollup_all
from esg_decarbonization_data_integration_and_data_pipline_spark.operators.windows import ytm_cumsum

SETTINGS = settings(max_examples=8, deadline=None,
                    suppress_health_check=[HealthCheck.function_scoped_fixture])

amounts = st.integers(min_value=-100, max_value=100)


@SETTINGS
@given(rows=st.lists(
    st.tuples(st.sampled_from(["a", "b"]), st.integers(1, 6), amounts),
    min_size=1, max_size=12))
def test_ytm_last_equals_group_total(spark, rows):
    # collapse duplicate (key, month) first, as the operator contract requires
    agg = {}
    for k, m, v in rows:
        agg[(k, m)] = agg.get((k, m), 0) + v
    df = spark.createDataFrame(
        [(k, m, float(v)) for (k, m), v in agg.items()],
        "k string, m int, amount double")
    out = ytm_cumsum(df, ["k"], "m", "amount").collect()
    by_key: dict[str, list] = {}
    for r in out:
        by_key.setdefault(r.k, []).append(r)
    for k, rs in by_key.items():
        rs.sort(key=lambda r: r.m)
        running = 0.0
        for r in rs:
            running += r.amount
            assert r.ytm_amount == running
        assert rs[-1].ytm_amount == sum(v for (kk, _), v in agg.items() if kk == k)


@SETTINGS
@given(rows=st.lists(
    st.tuples(st.sampled_from(["x", "y"]), st.sampled_from(["s1", "s2"]), amounts),
    min_size=1, max_size=10))
def test_rollup_all_consistency(spark, rows):
    df = spark.createDataFrame(
        [(a, b, float(v)) for a, b, v in rows], "bo string, site string, amount double")
    out = {(r.bo, r.site): r.amount for r in
           rollup_all(df, ["bo", "site"], [],
                      [F.sum("amount").alias("amount")]).collect()}
    total = sum(v for _, _, v in rows)
    assert out[("ALL", "ALL")] == total
    for bo in {a for a, _, _ in rows}:
        assert out[(bo, "ALL")] == sum(v for a, _, v in rows if a == bo)
        # detail rows sum to the bo rollup
        details = [v for (b, s), v in out.items() if b == bo and s != "ALL"]
        assert sum(details) == out[(bo, "ALL")]


@SETTINGS
@given(batches=st.lists(
    st.lists(st.tuples(st.sampled_from(["a", "b", "c"]),
                       st.sampled_from(["2023-01", "2023-02"]),
                       st.integers(-50, 50)),
             min_size=1, max_size=5),
    min_size=1, max_size=3))
def test_replace_keys_converges_to_last_batch(spark, tmp_path_factory, batches):
    """Applying batches via replace_keys leaves, per key, exactly the
    LAST batch's rows (upsert semantics), regardless of history; and
    re-applying the final batch changes nothing (idempotency)."""
    import os

    from esg_decarbonization_data_integration_and_data_pipline_spark.io import writers as W

    path = os.path.join(str(tmp_path_factory.mktemp("w")), "t")
    model: dict[tuple, float] = {}
    for batch in batches:
        collapsed = {}
        for k, m, v in batch:
            collapsed[(k, m)] = collapsed.get((k, m), 0) + v
        df = spark.createDataFrame(
            [(k, m, float(v)) for (k, m), v in collapsed.items()],
            "site string, period_month string, amount double")
        W.replace_keys(df, path, keys=["site", "period_month"])
        model.update(collapsed)
    got = {(r.site, r.period_month): r.amount
           for r in W.read_table(spark, path).collect()}
    assert got == {k: float(v) for k, v in model.items()}
    # idempotency: re-apply the last batch
    last = {}
    for k, m, v in batches[-1]:
        last[(k, m)] = last.get((k, m), 0) + v
    W.replace_keys(spark.createDataFrame(
        [(k, m, float(v)) for (k, m), v in last.items()],
        "site string, period_month string, amount double"),
        path, keys=["site", "period_month"])
    again = {(r.site, r.period_month): r.amount
             for r in W.read_table(spark, path).collect()}
    assert again == got


@SETTINGS
@given(left=st.lists(st.tuples(st.sampled_from(["k1", "k2"]), st.integers(0, 20)),
                     min_size=1, max_size=8),
       right=st.lists(st.tuples(st.sampled_from(["k1", "k2"]), st.integers(0, 20)),
                      min_size=0, max_size=8))
def test_asof_join_matches_bruteforce(spark, left, right):
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "k string, t int, lid int")
    rdf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(right)], "k string, rt int, rid int")
    out = {r.lid: (r.rt, r.rid) for r in
           asof_join(ldf, rdf, ["k"], "t", "rt",
                     tiebreak=["rid"]).collect()}
    for i, (k, t) in enumerate(left):
        cands = [(rt, j) for j, (rk, rt) in enumerate(right)
                 if rk == k and rt <= t]
        want = max(cands, key=lambda c: (c[0], c[1])) if cands else (None, None)
        assert out[i] == want
    assert len(out) == len(left)  # exactly one row per left row


import pytest



# long-tail suite: skipped by the default run (pytest.ini addopts -m "not slow");
# select with `-m slow`
pytestmark = pytest.mark.slow

@given(site_amounts=st.lists(st.floats(1.0, 1e6), min_size=1, max_size=6),
       splits=st.lists(st.floats(0.05, 1.0), min_size=1, max_size=5))
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_disaggregation_conserves_site_totals(spark, site_amounts, splits):
    """Ratio disaggregation is mass-preserving when the plant ratios
    sum to 1 for every period (raw_to_staging.py:670-752 semantics)."""
    import datetime as dt

    from esg_decarbonization_data_integration_and_data_pipline_spark.pipelines.elect_total import (
        disaggregate_site_to_plant,
    )
    total = sum(splits)
    ratios = [s / total for s in splits]
    periods = [dt.date(2024, m + 1, 1) for m in range(len(site_amounts))]
    site_rows = spark.createDataFrame(
        [("WKS", p, a) for p, a in zip(periods, site_amounts)]
        + [("WOK", periods[0], 123.0)],
        "site string, period_start date, amount double")
    ratio_df = spark.createDataFrame(
        [(f"WKS-{i}", p, r) for p in periods
         for i, r in enumerate(ratios)],
        "plant string, period_start date, ratio double")
    out = disaggregate_site_to_plant(site_rows, {"WKS": ratio_df})
    got = {r.site: r.total for r in
           out.groupBy("site").agg(F.sum("amount").alias("total")).collect()}
    assert got["WKS"] == pytest.approx(sum(site_amounts), rel=1e-9)
    assert got["WOK"] == pytest.approx(123.0)


@given(n_tokens=st.integers(0, 40),
       chunk=st.integers(2, 12),
       overlap_frac=st.floats(0.0, 0.99))
@SETTINGS
def test_chunking_covers_every_token_with_exact_overlap(
        spark, n_tokens, chunk, overlap_frac):
    """Invariants for any (chunk_tokens, overlap): every token index
    appears in >= 1 chunk; consecutive chunks start exactly step
    apart; every chunk except possibly the last is full-width; chunk
    texts reassemble the original tokens."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.text import (
        chunk_documents,
    )
    overlap = min(int(chunk * overlap_frac), chunk - 1)
    step = chunk - overlap
    toks = [f"w{i}" for i in range(n_tokens)]
    df = spark.createDataFrame([(0, " ".join(toks))],
                               "doc_id long, text string")
    rows = sorted(chunk_documents(df, chunk, overlap).collect(),
                  key=lambda r: r.chunk_idx)
    if n_tokens == 0:
        assert rows == []
        return
    covered = set()
    for r in rows:
        words = r.chunk_text.split()
        assert words == toks[r.chunk_idx * step:
                             r.chunk_idx * step + chunk]
        assert r.n_tokens == len(words)
        covered.update(range(r.chunk_idx * step,
                             r.chunk_idx * step + len(words)))
    assert covered == set(range(n_tokens))
    assert [r.chunk_idx for r in rows] == list(range(len(rows)))
    # all but the last chunk are full width
    assert all(r.n_tokens == chunk for r in rows[:-1])


@given(st.lists(st.text(
    alphabet=st.sampled_from("ab @.:/0123456789xyz+()-\n"),
    max_size=40), min_size=1, max_size=8))
@settings(max_examples=20, deadline=None)
def test_scrub_pii_idempotent_and_clean(texts):
    """Scrubbing is idempotent (a second pass finds nothing) and the
    cleaned text never still matches any PII pattern."""
    import re

    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.text import PII_PATTERNS

    # pure-python reference of the same chain (same regexes, same
    # order) -- the Spark op applies exactly these patterns
    def scrub(t):
        for _, pat, token in PII_PATTERNS:
            t = re.sub(pat, token, t)
        return t

    for t in texts:
        once = scrub(t)
        assert scrub(once) == once
        for name, pat, _ in PII_PATTERNS:
            assert not re.search(pat, once), (name, t, once)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.sampled_from(["web", "books", "code"]),
                min_size=3, max_size=40))
def test_mixture_sample_never_exceeds_ratios(spark, sources):
    """Property: per-source sample counts are exactly
    floor(N * w_s) for N = min_s floor(n_s / w_s) -- composition is
    achieved exactly, never exceeded, for any source distribution."""
    import math

    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.sampling import (
        mixture_sample,
    )

    weights = {"web": 0.5, "books": 0.3, "code": 0.2}
    rows = [(i, f"text number {i} id", s) for i, s in enumerate(sources)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    n_s = {s: sources.count(s) for s in weights}
    cap = min(math.floor(n_s[s] / w) for s, w in weights.items())
    got = {r.src: r.n for r in
           (mixture_sample(df, weights)
            .groupBy(F.col("source").alias("src"))
            .agg(F.count("*").alias("n")).collect())}
    for s, w in weights.items():
        assert got.get(s, 0) == math.floor(cap * w)


@SETTINGS
@given(docs=st.lists(
    st.tuples(st.integers(0, 50),
              st.text(alphabet="ab ", min_size=0, max_size=20)),
    min_size=1, max_size=14, unique_by=lambda t: t[0]))
def test_pack_sequences_model_parity(spark, docs):
    """Per-shard offsets equal a Python model packing in the same
    (md5(id), id) order; totals and sequence ids are consistent."""
    import hashlib

    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.packing import (
        pack_sequences,
    )

    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    seq_len, n_shards = 5, 3
    out = {r.doc_id: r for r in
           pack_sequences(df, seq_len=seq_len, n_shards=n_shards).collect()}
    # python model
    model = {}
    for did, tx in docs:
        nt = len([t for t in tx.split() if t])
        if nt == 0:
            continue
        md5 = hashlib.md5(str(did).encode()).hexdigest()
        shard = int(md5[:12], 16) % n_shards
        model.setdefault(shard, []).append((md5, did, nt))
    expect = {}
    for shard, rows in model.items():
        off = 0
        for _, did, nt in sorted(rows):
            expect[did] = (shard, off, off + nt)
            off += nt
    assert set(out) == set(expect)
    for did, (shard, start, end) in expect.items():
        r = out[did]
        assert (r.shard, r.start_off, r.end_off) == (shard, start, end)
        assert r.first_seq == start // seq_len
        assert r.last_seq == (end - 1) // seq_len


@SETTINGS
@given(docs=st.lists(
    st.tuples(st.integers(0, 50),
              st.text(alphabet="abc ", min_size=1, max_size=16)),
    min_size=1, max_size=14, unique_by=lambda t: t[0]),
    budget=st.integers(0, 40))
def test_token_budget_model_parity(spark, docs, budget):
    """The distributed prefix-sum equals the serial md5-order model
    for arbitrary corpora and budgets."""
    import hashlib

    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.sampling import (
        token_budget_sample,
    )

    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {r.doc_id: r.cum_tokens for r in
           token_budget_sample(df, budget).collect()}
    ordered = sorted(
        (hashlib.md5(tx.encode()).hexdigest(), tx, did,
         len([t for t in tx.split() if t]))
        for did, tx in docs)
    expect, cum = {}, 0
    for _, _, did, nt in ordered:
        cum += nt
        if cum <= budget:
            expect[did] = cum
    assert got == expect


@SETTINGS
@given(scores=st.lists(st.integers(0, 5), min_size=1, max_size=16),
       frac=st.sampled_from([0.0, 0.25, 0.5, 0.75, 1.0]))
def test_top_fraction_is_smallest_score_closed_superset(spark, scores, frac):
    import math

    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.sampling import (
        top_fraction_by_score,
    )

    rows = [(i, float(s)) for i, s in enumerate(scores)]
    df = spark.createDataFrame(rows, "doc_id bigint, score double")
    got = top_fraction_by_score(df, "score", frac).collect()
    k = math.ceil(len(rows) * frac)
    if k == 0:
        assert got == []
        return
    # smallest score-closed set with >= k rows
    ordered = sorted((s for _, s in rows), reverse=True)
    cutoff = ordered[k - 1]
    expect = {i for i, s in rows if s >= cutoff}
    assert {r.doc_id for r in got} == expect
    assert all(r.score_cutoff == cutoff for r in got)


@SETTINGS
@given(old=st.lists(st.tuples(st.integers(0, 8), st.sampled_from(["p", "q"])),
                    min_size=0, max_size=8, unique_by=lambda t: t[0]),
       new=st.lists(st.tuples(st.integers(0, 8), st.sampled_from(["p", "q"])),
                    min_size=0, max_size=8, unique_by=lambda t: t[0]))
def test_dataset_diff_partitions_ids(spark, old, new):
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.diff import dataset_diff

    o = spark.createDataFrame(old, "doc_id bigint, text string")
    n = spark.createDataFrame(new, "doc_id bigint, text string")
    got = {r.doc_id: r.status for r in dataset_diff(o, n).collect()}
    om, nm = dict(old), dict(new)
    assert set(got) == set(om) | set(nm)
    for did, status in got.items():
        if did not in om:
            assert status == "added"
        elif did not in nm:
            assert status == "removed"
        elif om[did] == nm[did]:
            assert status == "unchanged"
        else:
            assert status == "changed"


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.text(
    alphabet=st.sampled_from("ab \t\r\n\x00\x07\x0b\x1f\x7fxy."),
    max_size=30), min_size=1, max_size=6))
def test_normalize_matches_reference_fuzz(spark, texts):
    """Property: the Spark NORMALIZE_STEPS chain equals the
    pure-Python re.sub chain on arbitrary control/whitespace soups,
    and normalization is idempotent."""
    from tests.test_normalize_export import ref_normalize
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.text import (
        normalize_text,
    )

    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id bigint, text string")
    got = {r.doc_id: r.norm_text for r in normalize_text(df).collect()}
    for i, t in enumerate(texts):
        want = ref_normalize(t)
        assert got[i] == want, (t, got[i], want)
        assert ref_normalize(want) == want  # idempotent


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.lists(st.sampled_from("abcd"), min_size=0, max_size=12)
                .map(lambda ts: " ".join(ts)),
                min_size=1, max_size=6),
       st.integers(min_value=2, max_value=4))
def test_decontaminate_spans_matches_bruteforce(spark, texts, n):
    """Property: span excision equals a brute-force Python reference
    (gram windows, overlapping coverage, short docs) for arbitrary
    tiny-alphabet corpora; the LAST doc plays the benchmark."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.text import (
        decontaminate_spans,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string")
    bench_text = texts[-1]
    bench = spark.createDataFrame([(len(texts) - 1, bench_text)],
                                  "doc_id bigint, text string")

    def grams(t):
        toks = t.lower().split()
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}

    bg = grams(bench_text)
    got = {r.doc_id: r for r in
           decontaminate_spans(docs, bench, n=n).collect()}
    assert set(got) == set(range(len(texts) - 1))
    for i, t in enumerate(texts[:-1]):
        toks = t.lower().split()
        covered = set()
        hit = set()
        for s in range(len(toks) - n + 1):
            g = " ".join(toks[s:s + n])
            if g in bg:
                covered.update(range(s, s + n))
                hit.add(g)
        kept = [tok for j, tok in enumerate(toks) if j not in covered]
        r = got[i]
        assert r.clean_text == " ".join(kept), (t, bench_text, r.clean_text)
        assert r.n_tokens_removed == len(toks) - len(kept)
        assert r.n_hits == len(hit)
