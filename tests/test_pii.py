"""PII detection/redaction (operators/pii.py): rule semantics on
hand-built strings, null propagation, rule disjointness (order
independence of counts), a Python-`re` third-engine cross-check, and
the zero-shuffle plan pin for the registry query."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import Row, functions as F

from esg_decarbonization_data_integration_and_data_pipline_spark.operators import pii as P
from tests.test_plan_shapes import plan_of

CASES = [
    # (text, n_email, n_ipv4, n_ssn, n_phone)
    ("mail a.b+c@ex-ample.co.uk and x_y%z@sub.domain.org", 2, 0, 0, 0),
    ("ip 10.3.0.255 then 1.2.3.4, done", 0, 2, 0, 0),
    ("ssn 123-45-6789 phone 555-867-0042", 0, 0, 1, 1),
    ("adjacent:123-45-6789 555-867-0042 123-45-6789", 0, 0, 2, 1),
    # email whose local part is phone-shaped: detection scans each
    # rule independently over the ORIGINAL text (email AND phone both
    # count); redaction applies rules in table order, so the email
    # consumes the span (pinned below)
    ("555-867-0042@example.com", 1, 0, 0, 1),
    # versions / decimals must NOT look like IPs (only 3-dot runs hit)
    ("v1.2.3 pi 3.14 range 1.2-3.4", 0, 0, 0, 0),
    ("clean text with no pii at all", 0, 0, 0, 0),
    ("", 0, 0, 0, 0),
    (None, None, None, None, None),
]


@pytest.fixture(scope="module")
def detected(spark):
    rows = [Row(doc_id=i, text=t) for i, (t, *_e) in enumerate(CASES)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    return {r["doc_id"]: r for r in
            P.redact_pii(P.detect_pii(df), out_col="redacted").collect()}


def test_counts_match_expected(detected):
    for i, (_t, ne, nip, ns, nph) in enumerate(CASES):
        got = detected[i]
        assert (got["n_email"], got["n_ipv4"], got["n_ssn"],
                got["n_phone"]) == (ne, nip, ns, nph), f"case {i}"


def test_counts_match_python_re(detected):
    """Third engine: Python `re` over the exact same rule table (the
    patterns use only the Java/RE2/sre common subset)."""
    for i, (t, *_e) in enumerate(CASES):
        if t is None:
            continue
        for kind, pat, _tok in P.PII_RULES:
            assert detected[i][f"n_{kind}"] == len(re.findall(pat, t)), \
                f"case {i} kind {kind}"


def test_redaction_matches_python_re(detected):
    for i, (t, *_e) in enumerate(CASES):
        if t is None:
            assert detected[i]["redacted"] is None
            continue
        expect = t
        for _kind, pat, tok in P.PII_RULES:
            expect = re.sub(pat, tok, expect)
        assert detected[i]["redacted"] == expect, f"case {i}"


def test_redacted_text_is_clean(detected):
    """Redaction is a fixpoint: detect on the redacted text finds
    nothing (the tokens themselves match no rule)."""
    for i, (t, *_e) in enumerate(CASES):
        if t is None:
            continue
        red = detected[i]["redacted"]
        for _kind, pat, _tok in P.PII_RULES:
            assert not re.search(pat, red), f"case {i}: {red!r}"


def test_email_rule_wins_overlapping_spans(detected):
    """Redaction is table-ordered: an email whose local part is
    phone-shaped is consumed whole by the email rule, not left as
    '<PHONE>@example.com'."""
    assert detected[4]["redacted"] == "<EMAIL>"


def test_numeric_rules_order_independent(spark):
    """The three NUMERIC rules (ipv4/ssn/phone) are mutually disjoint
    on any input, so applying them in any order yields the same
    string -- only the email rule's precedence matters."""
    import itertools
    numeric = [r for r in P.PII_RULES if r[0] != "email"]
    texts = [t for t, *_ in CASES if t] + [
        "user9@example.com from 10.9.0.9 call 555-867-0009 ssn 123-45-0009"]
    for t in texts:
        results = set()
        for perm in itertools.permutations(numeric):
            s = t
            for _kind, pat, tok in perm:
                s = re.sub(pat, tok, s)
            results.add(s)
        assert len(results) == 1, f"order-dependent redaction on {t!r}"


def test_pii_query_is_narrow_zero_shuffle(spark, sf_dir):
    """pii_redact_docs is a pure per-row projection: no Exchange --
    at 100 TB it runs exactly as fast as the scan."""
    plan = plan_of(spark, sf_dir, "pii_redact_docs")
    assert "Exchange" not in plan
    # only the three needed columns reach the scan
    assert "n_chars" not in plan and "lang" not in plan
