"""normalize_text (regexp chain + NFKC kernel) and the JSONL shard
export sink, round-tripped through the JSONL corpus source."""

from __future__ import annotations

import glob
import gzip
import os
import re

import pytest
from pyspark.sql import functions as F

from esg_decarbonization_data_integration_and_data_pipline_spark.operators.text import (
    NORMALIZE_STEPS, normalize_text,
)


def ref_normalize(t: str | None, nfkc: bool = False) -> str | None:
    """Pure-Python reference of the same chain (Python re parses the
    escape subset identically to Java regex / RE2)."""
    if t is None:
        return None
    if nfkc:
        import unicodedata
        t = unicodedata.normalize("NFKC", t)
    for pat, repl in NORMALIZE_STEPS:
        t = re.sub(pat, repl, t)
    return t


CASES = [
    "hello world",
    "a\r\nb\rc\nd",                       # CRLF + lone CR + LF
    "x\x00y\x08z\x0b\x0c\x1f\x7fq",       # C0/DEL controls
    "keep\ttabs  and   runs",             # tabs + space runs
    "  edge \n\n\n\n middle \n tail  ",   # edges, 4 newlines, hugging
    "a \n b\n  \n\nc",
    "", "   ", "\n\n\n", None,
    "line1   \nline2\t\t\nline3",
]


def test_normalize_matches_python_reference(spark):
    rows = [(i, t) for i, t in enumerate(CASES)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: r for r in normalize_text(df).collect()}
    for i, t in enumerate(CASES):
        want = ref_normalize(t)
        assert got[i]["norm_text"] == want, (t, got[i]["norm_text"], want)
        if t is None:
            assert got[i]["chars_before"] is None
            assert got[i]["chars_after"] is None
        else:
            assert got[i]["chars_before"] == len(t)
            assert got[i]["chars_after"] == len(want)


def test_normalize_nfkc_matches_unicodedata(spark):
    cases = ["Ｈｅｌｌｏ　ｗｏｒｌｄ",   # fullwidth + ideographic space
             "ﬁn ﬂow",                    # ligatures
             "x y",                  # NBSP (NFKC -> space)
             "½ + ¼", "café"]
    df = spark.createDataFrame(list(enumerate(cases)),
                               "doc_id bigint, text string")
    got = {r.doc_id: r.norm_text
           for r in normalize_text(df, nfkc=True).collect()}
    for i, t in enumerate(cases):
        assert got[i] == ref_normalize(t, nfkc=True), (t, got[i])


def test_normalize_rejects_output_collision(spark):
    df = spark.createDataFrame([(1, "a", "x")],
                               "doc_id bigint, text string, norm_text string")
    with pytest.raises(ValueError, match="norm_text"):
        normalize_text(df)


def test_decontaminate_spans_surgical_removal(spark):
    """Only the covered token spans go; the rest of the doc survives
    (vs decontaminate_flags, which would drop the whole doc)."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.text import (
        decontaminate_spans,
    )

    bench = spark.createDataFrame(
        [(100, "what is the capital of france")],
        "doc_id bigint, text string")
    docs = spark.createDataFrame(
        [(1, "long page intro what is the capital of france answer "
             "paris plus much other clean content"),
         (2, "totally clean document with no overlap at all"),
         (3, None),
         (4, "what is the capital")],  # only a 4-token prefix: no 5-gram hit
        "doc_id bigint, text string")
    out = {r.doc_id: r for r in
           decontaminate_spans(docs, bench, n=5).collect()}
    # doc 1: the two overlapping 5-gram hits cover tokens 4-9
    # ("what is the capital of france"); everything else survives
    assert out[1].clean_text == ("long page intro answer paris plus "
                                 "much other clean content")
    assert out[1].n_tokens_removed == 6 and out[1].n_hits == 2
    assert out[2].clean_text == docs.filter("doc_id=2").first().text
    assert out[2].n_tokens_removed == 0 and out[2].n_hits == 0
    assert out[3].clean_text is None and out[3].n_tokens_removed == 0
    assert out[4].n_tokens_removed == 0  # shorter than n: no gram


def test_contamination_report_counts(spark):
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.text import (
        contamination_report,
    )

    bench = spark.createDataFrame(
        [(100, "what is the capital of france"),   # 6 toks -> 2 5-grams
         (101, "nothing matches this at all ever"),
         (102, None), (103, "too short"),
         (104, "a b a b a b a b a b")],  # 6 positions, 2 DISTINCT grams
        "doc_id bigint, text string")
    docs = spark.createDataFrame(
        [(1, "intro what is the capital of france outro"),
         (2, "again what is the capital of france here"),
         (3, "completely unrelated content in this one")],
        "doc_id bigint, text string")
    out = {r.doc_id: r for r in
           contamination_report(docs, bench, n=5).collect()}
    assert set(out) == {100, 101, 102, 103, 104}  # zeros stay in report
    assert out[100].n_grams == 2
    assert out[100].n_grams_hit == 2        # both 5-grams compromised
    assert out[100].n_corpus_docs == 2      # docs 1 and 2 share them
    assert out[101].n_grams == 2 and out[101].n_grams_hit == 0
    assert out[102].n_grams == 0 and out[102].n_corpus_docs == 0
    assert out[103].n_grams == 0
    # DISTINCT semantics: repeated grams don't inflate the total, so
    # n_grams_hit == n_grams is the "fully compromised" check
    assert out[104].n_grams == 2


def test_drop_duplicate_lines_within(spark):
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.text import (
        drop_duplicate_lines_within,
    )

    docs = spark.createDataFrame(
        [(1, "nav menu\nreal content one\nnav menu\nreal content two\n"
             "nav menu"),
         (2, "a\n\nb\n\nc"),          # empty lines are structure: kept
         (3, None),
         (4, ""),
         (5, "only one line")],
        "doc_id bigint, text string")
    out = {r.doc_id: r for r in
           drop_duplicate_lines_within(docs).collect()}
    assert out[1].clean_text == ("nav menu\nreal content one\n"
                                 "real content two")
    assert out[1].n_lines == 5 and out[1].n_dup_lines == 2
    assert out[2].clean_text == "a\n\nb\n\nc"  # blank lines survive
    assert out[2].n_dup_lines == 0
    assert out[3].clean_text is None and out[3].n_lines == 0
    assert out[4].clean_text == "" and out[4].n_lines == 1
    assert out[5].clean_text == "only one line"
    with pytest.raises(ValueError, match="clean_text"):
        drop_duplicate_lines_within(
            docs.withColumn("clean_text", docs.text))


def test_decontaminate_spans_excludes_benchmark_ids(spark):
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.text import (
        decontaminate_spans,
    )

    d = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f")],
        "doc_id bigint, text string")
    bench = d.filter("doc_id = 1")
    out = decontaminate_spans(d, bench, n=3)
    assert [r.doc_id for r in out.collect()] == [2]
    both = decontaminate_spans(d, bench, n=3, exclude_benchmark_ids=False)
    assert sorted(r.doc_id for r in both.collect()) == [1, 2]
    # and the overlap empties the doc completely
    assert both.filter("doc_id = 2").first().clean_text == ""


def _corpus(spark):
    rows = [(i, f"doc {i} body text", "en", f"src{i % 3}")
            for i in range(40)] + [(99, None, "en", "src0")]
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string")


def test_export_jsonl_round_trips_through_the_source(spark, tmp_path):
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.packing import (
        export_jsonl_shards,
    )
    from esg_decarbonization_data_integration_and_data_pipline_spark.sources.corpus_files import (
        read_jsonl_corpus,
    )

    out = str(tmp_path / "jsonl")
    man = export_jsonl_shards(_corpus(spark), out, n_shards=4)
    m = {r.shard: r for r in man.collect()}
    assert sum(r.n_docs for r in m.values()) == 40  # null text dropped
    docs, quarantine = read_jsonl_corpus(spark, f"{out}/docs")
    assert quarantine.count() == 0
    got = {(r.doc_id, r.text, r.lang, r.source) for r in docs.collect()}
    want = {(i, f"doc {i} body text", "en", f"src{i % 3}")
            for i in range(40)}
    assert got == want


def test_export_jsonl_one_gzip_file_per_shard_deterministic(spark, tmp_path):
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.packing import (
        export_jsonl_shards,
    )

    def export(tag):
        out = str(tmp_path / tag)
        export_jsonl_shards(_corpus(spark), out, n_shards=4)
        shards = {}
        for d in glob.glob(f"{out}/docs/shard=*"):
            files = [f for f in glob.glob(f"{d}/part-*") if
                     not f.endswith(".crc")]
            assert len(files) == 1, files
            assert files[0].endswith(".gz")
            with gzip.open(files[0], "rt") as fh:
                shards[os.path.basename(d)] = fh.read()
        return shards

    a, b = export("a"), export("b")
    assert a == b and len(a) == 4  # byte-identical re-export
    # within-shard order is the md5 routing order, not input order
    for body in a.values():
        assert body.strip()


def test_export_jsonl_duplicate_ids_still_deterministic(spark, tmp_path):
    """Re-uploaded ids (same doc_id, different text) tie on every id
    sort key; the md5(text)/text tiebreak keeps the export
    byte-identical across runs anyway."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.packing import (
        export_jsonl_shards,
    )

    rows = ([(7, f"version {v} of the resubmitted doc", "s") for v in range(6)]
            # identical (id, text) differing ONLY in another column:
            # the serialized line is the final sort key, so even these
            # order deterministically
            + [(8, "same text", f"meta{v}") for v in range(4)]
            + [(i, f"doc {i}", "s") for i in range(10)])
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")

    def export(tag):
        out = str(tmp_path / tag)
        export_jsonl_shards(df.repartition(8), out, n_shards=2)
        body = {}
        for d in glob.glob(f"{out}/docs/shard=*"):
            f = [p for p in glob.glob(f"{d}/part-*")
                 if not p.endswith(".crc")][0]
            with gzip.open(f, "rt") as fh:
                body[os.path.basename(d)] = fh.read()
        return body

    assert export("x") == export("y")


def test_export_jsonl_empty_corpus(spark, tmp_path):
    from esg_decarbonization_data_integration_and_data_pipline_spark.operators.packing import (
        export_jsonl_shards,
    )

    empty = spark.createDataFrame([], "doc_id bigint, text string")
    man = export_jsonl_shards(empty, str(tmp_path / "e"), n_shards=2)
    assert man.count() == 0
    assert {"shard", "n_docs", "total_chars"} <= set(man.columns)
    with pytest.raises(ValueError):
        export_jsonl_shards(empty, str(tmp_path / "e2"), n_shards=0)
