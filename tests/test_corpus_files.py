"""JSONL / raw-text corpus sources with malformed-line quarantine."""

from __future__ import annotations

import os

from esg_decarbonization_data_integration_and_data_pipline_spark.sources.corpus_files import (
    read_jsonl_corpus, read_text_corpus,
)

JSONL = """\
{"doc_id": 1, "text": "hello world", "lang": "en", "source": "web"}
{"doc_id": 2, "text": "zweite zeile", "lang": "de"}
this line is not json at all
{"doc_id": 3, "text": "extra fields ignored", "lang": "en", "source": "web", "extra": 42}
{"doc_id": "not-a-number", "text": "type clash quarantines"}
{"doc_id": 5, "text": null, "lang": "en", "source": "web"}
"""


def test_jsonl_round_trip_with_quarantine(spark, tmp_path):
    p = tmp_path / "corpus.jsonl"
    p.write_text(JSONL)
    docs, quarantine = read_jsonl_corpus(spark, str(p))
    got = {r.doc_id: r for r in docs.collect()}
    # good rows bind; missing fields are null; extra fields drop
    assert set(got) == {1, 2, 3, 5}
    assert got[2].source is None
    assert got[5].text is None
    assert docs.columns == ["doc_id", "text", "lang", "source"]
    bad = [r.raw_line for r in quarantine.collect()]
    assert len(bad) == 2
    assert any("not json at all" in b for b in bad)
    assert any("not-a-number" in b for b in bad)


def test_jsonl_zero_bound_and_array_lines_quarantine(spark, tmp_path):
    p = tmp_path / "edge.jsonl"
    p.write_text("{}\n"
                 '{"other_field": 1}\n'
                 '[{"doc_id": 9, "text": "array line"}]\n'
                 '{"doc_id": 10, "text": "fine"}\n')
    docs, q = read_jsonl_corpus(spark, str(p))
    assert [r.doc_id for r in docs.collect()] == [10]
    # renamed/empty/array lines surface in quarantine, never as
    # silent all-null docs rows
    assert q.count() == 3


def test_jsonl_all_good_and_all_bad(spark, tmp_path):
    good = tmp_path / "good.jsonl"
    good.write_text('{"doc_id": 7, "text": "ok"}\n')
    docs, q = read_jsonl_corpus(spark, str(good))
    assert docs.count() == 1 and q.count() == 0
    bad = tmp_path / "bad.jsonl"
    bad.write_text("garbage\nmore garbage\n")
    docs, q = read_jsonl_corpus(spark, str(bad))
    assert docs.count() == 0 and q.count() == 2


def test_jsonl_custom_schema(spark, tmp_path):
    p = tmp_path / "c.jsonl"
    p.write_text('{"id": 1, "body": "x"}\n')
    docs, q = read_jsonl_corpus(spark, str(p),
                                schema="id bigint, body string")
    assert docs.collect()[0].asDict() == {"id": 1, "body": "x"}
    assert q.count() == 0


def test_text_corpus_one_doc_per_file(spark, tmp_path):
    d = tmp_path / "tree" / "sub"
    os.makedirs(d)
    (tmp_path / "tree" / "a.txt").write_text("first doc\nwith lines")
    (d / "b.txt").write_text("second doc")
    df = read_text_corpus(spark, str(tmp_path / "tree"))
    rows = {os.path.basename(r.doc_path): r for r in df.collect()}
    assert set(rows) == {"a.txt", "b.txt"}
    assert rows["a.txt"].text == "first doc\nwith lines"  # file = one row
    ids = {r.doc_id for r in rows.values()}
    assert len(ids) == 2 and all(isinstance(i, int) for i in ids)
    # ids are stable across reads
    again = {os.path.basename(r.doc_path): r.doc_id
             for r in read_text_corpus(spark, str(tmp_path / "tree")).collect()}
    assert all(again[k] == rows[k].doc_id for k in rows)
