"""Exact-substring dedup (Lee et al. 2021 ExactSubstr, rolling-window
re-expression): keep-first rule, gaps-and-islands span merge, and the
token-stream excision rebuild (operators/text.exact_substring_spans /
exact_substring_dedup)."""

from __future__ import annotations

import pytest

from esg_decarbonization_data_integration_and_data_pipline_spark.operators.text import (
    exact_substring_dedup, exact_substring_spans,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _spans(df):
    return sorted(
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in df.collect())


def test_cross_doc_copy_flags_second_doc_only(spark):
    """A verbatim window shared by two docs flags every copy but the
    corpus-first (smallest (doc_id, position))."""
    boiler = "a b c d e f g h"  # exactly n=8 tokens
    docs = _docs(spark, [(1, boiler + " unique one two three"),
                         (2, "other prefix words here " + boiler)])
    got = _spans(exact_substring_spans(docs, n=8))
    # doc 2's copy starts at token 5 and covers [5, 12]
    assert got == [(2, 5, 12, 8)]


def test_within_doc_repeat_flags_second_occurrence(spark):
    toks = "p q r s t u v w"
    docs = _docs(spark, [(7, toks + " x y z " + toks)])
    got = _spans(exact_substring_spans(docs, n=8))
    # second copy starts at token 12 (8 + 3 filler + 1)
    assert got == [(7, 12, 19, 8)]


def test_adjacent_windows_merge_to_one_maximal_span(spark):
    """A duplicated run LONGER than n merges its overlapping flagged
    windows into one maximal span covering the whole run."""
    run = "m1 m2 m3 m4 m5 m6 m7 m8 m9 m10"  # 10 tokens > n=8
    docs = _docs(spark, [(1, run), (2, run)])
    got = _spans(exact_substring_spans(docs, n=8))
    # doc 2: starts 1,2,3 all flagged -> one span [1, 10]
    assert got == [(2, 1, 10, 10)]


def test_disjoint_duplicates_stay_separate_spans(spark):
    a = "a1 a2 a3 a4 a5 a6 a7 a8"
    b = "b1 b2 b3 b4 b5 b6 b7 b8"
    gap = "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10"
    docs = _docs(spark, [(1, a), (2, b),
                         (3, a + " " + gap + " " + b)])
    got = _spans(exact_substring_spans(docs, n=8))
    assert got == [(3, 1, 8, 8), (3, 19, 26, 8)]


def test_min_count_three_requires_three_copies(spark):
    dup2 = "c1 c2 c3 c4 c5 c6 c7 c8"
    dup3 = "d1 d2 d3 d4 d5 d6 d7 d8"
    docs = _docs(spark, [(1, dup2), (2, dup2),
                         (3, dup3), (4, dup3), (5, dup3)])
    got = _spans(exact_substring_spans(docs, n=8, min_count=3))
    # dup2 has only 2 copies -> not flagged at min_count=3; dup3's
    # 2nd and 3rd copies flag
    assert got == [(4, 1, 8, 8), (5, 1, 8, 8)]


def test_short_and_null_docs_produce_no_spans(spark):
    docs = _docs(spark, [(1, "only seven tokens in this doc here"),
                         (2, None), (3, "")])
    assert exact_substring_spans(docs, n=8).count() == 0


def test_case_folding_matches_mixed_case_copies(spark):
    docs = _docs(spark, [(1, "A B C D E F G H"),
                         (2, "a b c d e f g h")])
    got = _spans(exact_substring_spans(docs, n=8))
    assert got == [(2, 1, 8, 8)]


def test_dedup_excises_spans_and_keeps_survivors(spark):
    boiler = "a b c d e f g h"
    docs = _docs(spark, [(1, boiler), (2, boiler + " tail words")])
    out = {r.doc_id: r for r in exact_substring_dedup(docs, n=8).collect()}
    assert out[1].clean_text == boiler          # corpus-first survives
    assert out[1].n_tokens_removed == 0 and out[1].n_spans == 0
    assert out[2].clean_text == "tail words"
    assert out[2].n_tokens_removed == 8 and out[2].n_spans == 1


def test_dedup_full_doc_excision_yields_empty_string(spark):
    boiler = "z1 z2 z3 z4 z5 z6 z7 z8"
    docs = _docs(spark, [(1, boiler), (2, boiler)])
    out = {r.doc_id: r for r in exact_substring_dedup(docs, n=8).collect()}
    assert out[2].clean_text == ""
    assert out[2].n_tokens_removed == 8


def test_dedup_null_text_passes_through(spark):
    docs = _docs(spark, [(1, None)])
    row = exact_substring_dedup(docs, n=8).collect()[0]
    assert row.clean_text is None
    assert row.n_tokens_removed == 0 and row.n_spans == 0


def test_parameter_validation():
    with pytest.raises(ValueError, match="min_count"):
        exact_substring_spans(None, n=8, min_count=1)
    with pytest.raises(ValueError, match="n must be"):
        exact_substring_spans(None, n=0)


def test_unicode_whitespace_tokenizes_like_the_jvm(spark):
    """NBSP is NOT a token boundary under Java's ASCII '\\s+' (the
    rebuild/oracle tokenizer); the gram kernel must agree or every
    subsequent index shifts (r14 review finding)."""
    plain = "a b c d e f g h"
    nbsp_doc = "x\u00a0y " + plain  # 'x\u00a0y' is ONE token
    docs = _docs(spark, [(1, plain), (2, nbsp_doc)])
    got = _spans(exact_substring_spans(docs, n=8))
    # doc 2's copy starts at token 2 -- NOT 3: the NBSP pair is one
    # token, exactly as the JVM/SQL '\\s+' split sees it (Python
    # str.split() would have split it and shifted the index)
    assert got == [(2, 2, 9, 8)]
    out = {r.doc_id: r for r in exact_substring_dedup(docs, n=8).collect()}
    assert out[1].n_tokens_removed == 0
    assert out[2].clean_text == "x\u00a0y"
    assert out[2].n_tokens_removed == 8
