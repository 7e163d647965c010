"""PII detection and redaction over a document corpus.

Standard curation step in public training-data pipelines (Dolma,
RedPajama, FineWeb all regex-scrub emails / IPs / phone-shaped
strings before release); the reference has no analog, so the north
star is those published pipelines, re-expressed as narrow JVM regexp
chains (SURVEY.md "text analysis" tier).

THE canonical PII rule table: this module unifies the round-6
``operators/text.PII_PATTERNS`` tier (email/url/phone -- text.py now
aliases this table and ``text.scrub_pii`` redacts through this
chain) with the round-9 additions (ipv4, ssn), so exactly one
ordered table governs every scrub in the engine -- the curation
pipeline's first gate, both registry queries' Spark sides, and both
generated DuckDB oracle chains.

Design notes:
- One ordered rule table :data:`PII_RULES` drives BOTH engines: the
  Spark chain here and the DuckDB oracle chains in plans/ are
  generated from it, so they cannot drift (same discipline as
  ``operators/text.NORMALIZE_STEPS``).
- Patterns use only the Java-regex / RE2 common subset (no
  backreferences, no lookaround).  Detection counts each rule
  INDEPENDENTLY over the original text (an email whose local part is
  phone-shaped counts as both; the broad digit-run phone rule also
  fires on SSN-shaped strings -- the count columns answer "does this
  rule fire", not "which rule owns the span"); redaction applies the
  rules in table order, so earlier rules consume overlapping spans
  (email before the numeric rules, ssn before the broader phone
  rule) and every span gets its most specific token.
- Everything is a narrow per-row projection: zero shuffles, inside
  whole-stage codegen, embarrassingly parallel -- the 100 TB shape is
  "as fast as the scan" (plan pinned by tests/test_plan_shapes.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# (kind, pattern, replacement token) -- applied in this order.
# The pattern subset is deliberately RE2-compatible: the DuckDB
# oracles run the exact same strings.  Order encodes specificity:
# email first (local parts may contain digit/dash runs the numeric
# rules would nibble at), then url, then ipv4 (dots keep it disjoint
# from the dash/space digit runs), then ssn BEFORE the broad phone
# rule -- phone's digit-run pattern (the reference r6 tier's,
# deliberately broad: international prefixes, parens, spaced groups)
# also matches SSN-shaped strings, so ssn must claim its spans
# first.
PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("url", r"https?://[^\s]+", "<URL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IPV4>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\+?[0-9][0-9()\- ]{7,}[0-9]", "<PHONE>"),
)


def detect_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add one ``n_<kind>`` BIGINT column per rule: the number of
    non-overlapping leftmost matches in ``text_col`` (NULL text =>
    NULL counts, matching SQL semantics).  ``regexp_count`` is a
    codegen'd JVM expression -- no Python, no shuffle."""
    out = df
    for kind, pat, _tok in PII_RULES:
        out = out.withColumn(
            f"n_{kind}",
            F.regexp_count(F.col(text_col), F.lit(pat)).cast("long"))
    return out


def extract_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add one ``m_<kind>`` array<string> column per rule: the actual
    matched spans, in document order -- the review-queue face of the
    tier (counts say how much, spans say WHAT leaked).  Same
    independent-scan semantics as :func:`detect_pii`; NULL text =>
    NULL arrays.  ``regexp_extract_all`` is codegen'd JVM -- narrow,
    zero-shuffle."""
    out = df
    for kind, pat, _tok in PII_RULES:
        out = out.withColumn(
            f"m_{kind}",
            F.regexp_extract_all(F.col(text_col), F.lit(pat), 0))
    return out


def redact_column(col: Column) -> Column:
    """The redaction expression alone: every rule's matches replaced
    by its token, in table order."""
    out = col
    for _kind, pat, tok in PII_RULES:
        out = F.regexp_replace(out, pat, tok)
    return out


def redact_pii(df: DataFrame, text_col: str = "text",
               out_col: str | None = None) -> DataFrame:
    """Replace every PII match in ``text_col`` with its rule token
    (in ``out_col``, default in place).  Chain of built-in
    ``regexp_replace`` -- narrow, zero-shuffle."""
    return df.withColumn(out_col or text_col,
                         redact_column(F.col(text_col)))


def sql_detect_expr(kind: str, var: str) -> str:
    """DuckDB twin of one :func:`detect_pii` count column."""
    pat = dict((k, p) for k, p, _t in PII_RULES)[kind]
    return (f"CAST(len(regexp_extract_all({var}, '{pat}')) AS BIGINT)")


def sql_redact_chain(var: str) -> str:
    """DuckDB expr running EXACTLY the :func:`redact_pii` chain --
    generated from the same rule table so the two cannot drift."""
    expr = var
    for _kind, pat, tok in PII_RULES:
        expr = f"regexp_replace({expr}, '{pat}', '{tok}', 'g')"
    return expr
