"""Snapshot-diff driven incremental curation (diff -> stateless gates
-> incremental dedup -> keyed merge/delete)."""

from __future__ import annotations

from esg_decarbonization_data_integration_and_data_pipline_spark.pipelines.corpus_curation import (
    incremental_curate,
)
from esg_decarbonization_data_integration_and_data_pipline_spark.streaming.docs_dedup import seed_index

SCHEMA = "doc_id bigint, text string"
GOOD_A = ("the of and to in is a good long document with many different "
          "words appearing here to clear the floor easily " * 2)
GOOD_B = ("a second fully independent article the of and to in is about "
          "other topics entirely with plenty of distinct words here " * 2)
GOOD_C = ("the of and to in is a third article with yet another set of "
          "many varied tokens to keep the word floor satisfied here " * 2)

V1 = [(1, GOOD_A), (2, GOOD_B), (3, GOOD_C)]
V2 = [(1, GOOD_A),                                   # unchanged
      (2, GOOD_B + " now revised"),                  # changed
      # 3 removed
      (4, GOOD_A + " extra tail words"),             # added, near-dup of 1
      (5, "tiny the a doc"),                         # added, fails gate
      (6, ("fresh independent the of and to in is content with a wholly "
           "new vocabulary spread across many unique terms here " * 2))]


def _mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_incremental_curate_lifecycle(spark, tmp_path):
    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "index")
    seed_index(spark, index)
    empty = _mk(spark, [])

    # bootstrap: everything in v1 is 'added'
    r1 = incremental_curate(empty, _mk(spark, V1), corpus, index,
                            gopher={"min_words": 25}, threshold=0.3)
    assert r1["added"] == 3 and r1["merged"] == 3
    assert {r.doc_id for r in spark.read.parquet(corpus).collect()} \
        == {1, 2, 3}

    # v1 -> v2: one changed, one removed, three added (near-dup /
    # gate-fail / fresh)
    r2 = incremental_curate(_mk(spark, V1), _mk(spark, V2), corpus, index,
                            gopher={"min_words": 25}, threshold=0.3)
    assert r2["changed"] == 1 and r2["removed"] == 1 and r2["added"] == 3
    assert r2["unchanged"] == 1
    assert r2["reprocessed"] == 4            # changed + 3 added
    assert r2["gated_out"] == 1              # doc 5
    assert r2["dup_dropped"] == 1            # doc 4 vs index doc 1
    assert r2["merged"] == 2                 # docs 2 (new text) and 6
    got = {r.doc_id: r.text for r in spark.read.parquet(corpus).collect()}
    assert set(got) == {1, 2, 6}
    assert got[2].endswith("now revised")    # changed text replaced

    # replaying the same diff CONVERGES (keyed delete + keyed merge)
    r3 = incremental_curate(_mk(spark, V1), _mk(spark, V2), corpus, index,
                            gopher={"min_words": 25}, threshold=0.3)
    assert r3["merged"] == 2
    again = {r.doc_id for r in spark.read.parquet(corpus).collect()}
    assert again == {1, 2, 6}

    # the index tracks live docs only: changed doc 2's stale signature
    # was deleted, so its id appears once after the replay compacts
    idx_ids = [r.id for r in
               spark.read.parquet(index).select("id").distinct().collect()]
    assert sorted(idx_ids) == [1, 2, 6]


def test_incremental_noop_when_nothing_changed(spark, tmp_path):
    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "index")
    seed_index(spark, index)
    empty = _mk(spark, [])
    v1 = _mk(spark, V1)
    incremental_curate(empty, v1, corpus, index, gopher={"min_words": 25})
    r = incremental_curate(v1, v1, corpus, index, gopher={"min_words": 25})
    assert r["reprocessed"] == 0 and r["merged"] == 0
    assert r["unchanged"] == 3
    assert spark.read.parquet(corpus).count() == 3


def test_incremental_normalize_matches_full_pass_signatures(spark, tmp_path):
    """normalize=True must be load-bearing for dedup: a variant whose
    TOKENS are polluted with control characters (so raw shingles
    share almost nothing with the clean doc) normalizes back to the
    original and dedups against the corpus; without normalization the
    same variant merges as a 'new' doc."""
    base = GOOD_A
    # pollute every other word from the inside: raw tokens differ,
    # normalized tokens are identical
    variant = " ".join(w[0] + "\x07" + w[1:] if i % 2 else w
                       for i, w in enumerate(base.split()))

    def run(tag, normalize):
        corpus = str(tmp_path / f"corpus_{tag}")
        index = str(tmp_path / f"index_{tag}")
        v1 = _mk(spark, [(1, base)])
        seed_index(spark, index)
        r1 = incremental_curate(_mk(spark, []), v1, corpus, index,
                                normalize=normalize)
        assert r1["merged"] == 1
        v2 = _mk(spark, [(1, base), (9, variant)])
        return incremental_curate(v1, v2, corpus, index,
                                  normalize=normalize, threshold=0.5)

    normed = run("on", True)
    assert normed["added"] == 1 and normed["dup_dropped"] == 1
    assert normed["merged"] == 0   # recognized as a dup of doc 1
    raw = run("off", False)
    assert raw["dup_dropped"] == 0 and raw["merged"] == 1  # missed
