"""Replay-list completeness: the crafted null-text corpus replay
(tests/test_oracle_nulltext.py) is the r1-r7 discipline for catching
kernel-vs-oracle divergences on null/empty/whitespace texts.  That
list is maintained by hand, so this test derives the set it MUST
cover -- every oracle-backed registry query whose oracle reads the
documents table and nothing else (queries touching embeddings or the
TPC-H tables cannot run on the single-table crafted corpus) -- and
fails when a new documents query lands without replay insurance."""

from __future__ import annotations

import re

from esg_decarbonization_data_integration_and_data_pipline_spark.plans.queries import REGISTRY

_OTHER_TABLES = ["region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "embeddings"]


def _documents_only_queries() -> set[str]:
    out = set()
    for name, spec in REGISTRY.items():
        if spec.oracle is None:
            continue
        sql = spec.oracle.lower()
        if not re.search(r"\bdocuments\b", sql):
            continue
        if any(re.search(rf"\b{t}\b", sql) for t in _OTHER_TABLES):
            continue
        out.add(name)
    return out


def test_nulltext_replay_covers_every_documents_query():
    from tests.test_oracle_nulltext import QUERIES

    required = _documents_only_queries()
    missing = sorted(required - set(QUERIES))
    assert not missing, (
        f"documents-table queries lacking null-text replay insurance: "
        f"{missing} -- add them to tests/test_oracle_nulltext.QUERIES")
    unknown = sorted(set(QUERIES) - set(REGISTRY))
    assert not unknown, f"replay list names unknown queries: {unknown}"
