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
    # (text, n_email, n_url, n_ipv4, n_ssn, n_phone).  The phone rule
    # is the broad r6 digit-run pattern: it also fires on SSN-shaped
    # strings (counts are independent per rule) and merges adjacent
    # space-separated digit groups into one match (case 'adjacent').
    ("mail a.b+c@ex-ample.co.uk and x_y%z@sub.domain.org", 2, 0, 0, 0, 0),
    ("ip 10.3.0.255 then 1.2.3.4, done", 0, 0, 2, 0, 0),
    ("ssn 123-45-6789 phone 555-867-0042", 0, 0, 0, 1, 2),
    ("adjacent:123-45-6789 555-867-0042 123-45-6789", 0, 0, 0, 2, 1),
    # email whose local part is phone-shaped: detection scans each
    # rule independently over the ORIGINAL text (email AND phone both
    # count); redaction applies rules in table order, so the email
    # consumes the span (pinned below)
    ("555-867-0042@example.com", 1, 0, 0, 0, 1),
    # versions / decimals must NOT look like IPs (only 3-dot runs hit)
    ("v1.2.3 pi 3.14 range 1.2-3.4", 0, 0, 0, 0, 0),
    ("docs at https://a.b/c?q=1 and http://x.y end", 0, 2, 0, 0, 0),
    ("clean text with no pii at all", 0, 0, 0, 0, 0),
    ("", 0, 0, 0, 0, 0),
    (None, None, None, None, None, None),
]


@pytest.fixture(scope="module")
def detected(spark):
    rows = [Row(doc_id=i, text=t) for i, (t, *_e) in enumerate(CASES)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    return {r["doc_id"]: r for r in
            P.redact_pii(P.detect_pii(df), out_col="redacted").collect()}


def test_counts_match_expected(detected):
    for i, (_t, ne, nu, nip, ns, nph) in enumerate(CASES):
        got = detected[i]
        assert (got["n_email"], got["n_url"], got["n_ipv4"],
                got["n_ssn"], got["n_phone"]) == (ne, nu, nip, ns, nph), \
            f"case {i}"


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


def test_ssn_claims_spans_before_broad_phone(detected):
    """The specific-before-broad table order: an SSN-shaped string is
    tokenized <SSN> even though the broad digit-run phone rule also
    matches it, and the truly phone-shaped neighbor still gets
    <PHONE>."""
    assert detected[2]["redacted"] == "ssn <SSN> phone <PHONE>"
    assert detected[3]["redacted"] == "adjacent:<SSN> <PHONE> <SSN>"


def test_extract_matches_python_findall(spark):
    rows = [Row(doc_id=i, text=t) for i, (t, *_e) in enumerate(CASES)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in P.extract_pii(df).collect()}
    for i, (t, *_e) in enumerate(CASES):
        for kind, pat, _tok in P.PII_RULES:
            want = None if t is None else re.findall(pat, t)
            assert got[i][f"m_{kind}"] == want, f"case {i} kind {kind}"


def test_pii_query_is_narrow_zero_shuffle(spark, sf_dir):
    """pii_redact_docs is a pure per-row projection: no Exchange --
    at 100 TB it runs exactly as fast as the scan."""
    plan = plan_of(spark, sf_dir, "pii_redact_docs")
    assert "Exchange" not in plan  # 5 counts + 5 replaces, all narrow
    # only the three needed columns reach the scan
    assert "n_chars" not in plan and "lang" not in plan
