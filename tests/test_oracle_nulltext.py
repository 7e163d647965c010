"""Oracle parity on a crafted corpus WITH null/empty texts.

The driver fixtures contain no null texts, so the sf-replay suite
cannot catch a kernel-vs-oracle divergence on them; this pins the
text/dedup oracles against exactly that corpus (the round-4 review
found two such latent divergences -- both fixed, both pinned here).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

from esg_decarbonization_data_integration_and_data_pipline_spark.plans.queries import REGISTRY

ROWS = [
    (0, "hello world hello world", "en", "crafted", 23),
    (1, None, "en", "crafted", 0),           # null text
    (2, "   ", "en", "crafted", 3),          # whitespace only
    (3, "", "en", "crafted", 0),             # empty string
    (4, "hello world hello world", "en", "crafted", 23),  # exact dup of 0
    (5, "one", "en", "crafted", 3),          # single token
]
QUERIES = ["text_repetition", "dedup_simhash64_pairs", "dedup_simhash",
           "dedup_exact", "text_token_counts", "dedup_minhash_candidates",
           "dedup_minhash_verified", "dedup_simhash_pairs",
           "dedup_jaccard_pairs", "dedup_clusters", "deterministic_split",
           "text_fingerprint", "text_lang_id", "text_quality",
           "multimodal_features", "stratified_sample_docs",
           "chunk_documents", "vocab_top_tokens", "tfidf_top_terms",
           # round-6 documents-table queries: same latent-divergence
           # insurance (null text, empty text, whitespace-only,
           # single-token, exact dup)
           "text_scrub_pii", "text_char_entropy",
           "text_boilerplate_ngrams", "text_boilerplate_share",
           "decontaminate_ngrams", "text_unigram_nll",
           "mixture_sample_docs", "dedup_minhash_incremental",
           "dedup_chunk_overlap",
           # round-6 late additions (export tier)
           "pack_sequences_docs", "mixture_temperature_docs",
           "quality_gopher_rules", "token_budget_docs",
           "text_line_dedup", "corpus_profile_by_source",
           "quality_top_fraction",
           # round-7 audit: every oracle-backed documents-only query
           # must appear here (tests/test_replay_coverage.py enforces
           # the completeness so a future addition cannot silently
           # skip this corpus)
           "token_budget_mixture_docs", "dataset_diff_docs",
           "text_normalize_docs", "decontaminate_spans_docs",
           "contamination_report_docs", "text_dedup_doc_lines",
           "corpus_token_histogram",
           # round-8: per-doc curation rejection audit (null/empty/
           # whitespace/single-token docs must all attribute to the
           # quality gate identically on both engines)
           "rejection_audit_docs",
           # round-8: bigram-LM NLL (null/empty/whitespace and the
           # single-token doc -- which has NO bigrams and must drop
           # out identically on both engines)
           "text_bigram_nll",
           # round-9: PII over the in-plan augmented corpus (null
           # text must null-propagate through concat on BOTH engines;
           # empty/whitespace docs still get injected PII) and the
           # bloom-accelerated dedup (null texts excluded identically
           # on both sides; the crafted corpus makes every batch doc
           # novel)
           "pii_redact_docs", "dedup_bloom_incremental",
           # round-9: BM25 retrieval -- doc 0 of the crafted corpus
           # IS a query (%83 == 0 slice), so null/empty/whitespace
           # corpus docs and the exact-dup doc flow through the
           # full idf/score/rank path on both engines
           "bm25_retrieval_docs",
           # round-13: the frozen-merge BPE encoder (null text
           # filtered identically on both sides; empty/whitespace
           # docs encode to zero tokens; the exact-dup doc encodes
           # identically)
           "bpe_encode_docs",
           # round-14: the graded BPE TRAINER -- the crafted corpus
           # exercises the early-stop path too (few repeated pairs),
           # and the learned-merge encode must match the oracle's
           # unrolled CTE chain on null/empty/whitespace/single-char
           # docs
           "bpe_tokenize_docs",
           # round-14 (late): exact-substring dedup -- every crafted
           # doc is under the 8-token window, so the span frame must
           # be EMPTY on both engines (the short-doc guard) and the
           # excision must pass null/empty/whitespace docs through
           # with the right clean_text (None / '' / '')
           "exact_substring_spans_docs", "exact_substring_dedup_docs"]


@pytest.fixture(scope="module")
def crafted_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("nulltext")
    pdf = pd.DataFrame(ROWS, columns=["doc_id", "text", "lang",
                                      "source", "n_chars"])
    pdf.to_parquet(str(d / "documents.parquet"))
    return str(d)


def _canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    out = []
    for row in df.itertuples(index=False):
        vals = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                vals.append("<NULL>")
            elif isinstance(v, float):
                vals.append(f"{v:.6g}")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


@pytest.mark.parametrize("name", QUERIES)
def test_crafted_nulltext_matches_oracle(name, spark, crafted_dir):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, crafted_dir).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{crafted_dir}/documents.parquet')")
    ddf = con.execute(spec.oracle).fetchdf()
    assert sorted(sdf.columns) == sorted(ddf.columns)
    assert len(sdf) == len(ddf)
    assert _canon(sdf) == _canon(ddf)
