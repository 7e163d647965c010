"""Rotation-discipline pins for the driver head-50 (r7 verdict #1-#2).

The driver grades only the first 50 registry entries; everything else
relies on the in-repo oracle replay. These tests pin the round-8
burn-down plan structurally: the head is exactly 50 wide, the nine
never-driver-graded priority queries are in it, every rotated-out
query was externally graded >= 2 rounds first, and the never-graded
backlog (excluding the pending head, which the next driver run will
grade) is at most 20.
"""

from __future__ import annotations

import subprocess
import sys

from tools.grading_ledger import graded_rounds, registry_order

# round-8 rotations INTO the head -- the judge's priority list from the
# r7 verdict (tasks #1 and #2) verbatim.
R8_ROTATED_IN = [
    "text_normalize_docs", "decontaminate_spans_docs",
    "contamination_report_docs", "text_dedup_doc_lines",
    "corpus_token_histogram", "quality_gopher_rules",
    "mixture_temperature_docs", "token_budget_mixture_docs",
    "dataset_diff_docs",
]


def test_head_is_exactly_50_and_matches_registry():
    head, tail = registry_order()
    assert len(head) == 50
    from esg_decarbonization_data_integration_and_data_pipline_spark.plans.queries import REGISTRY
    assert set(head) | set(tail) == set(REGISTRY)
    assert len(head) + len(tail) == len(REGISTRY)


def test_r8_priority_queries_completed_their_grading():
    """The r8 rotation's purpose, not its layout: each of the nine
    r7-verdict priority queries crossed the driver gate >= 2 rounds
    (they held head slots through r8-r9 and most rotated to the tail
    in r10 once that bar was met)."""
    graded = graded_rounds()
    short = [q for q in R8_ROTATED_IN if len(graded.get(q, [])) < 2]
    assert not short, f"r8 rotations with < 2 graded rounds: {short}"


def test_rotated_out_queries_were_graded_at_least_twice():
    """Every tail query that ever crossed the driver gate did so >= 2
    rounds before rotating out (approx_sketches excepted: rows-only by
    design, documented at its _DRIVER_TAIL entry).  Asserts through
    the SAME rotation_violations() the tool's --check runs, so the
    rule cannot drift between the two (r8 review finding)."""
    from tools.grading_ledger import rotation_violations

    assert rotation_violations() == []


def test_never_graded_backlog_is_at_most_2_after_pending_head():
    """r9 verdict #1 target: tail backlog <= 2 after the round-10
    rotation (was <= 11 after round 9).  The pending-head queries are
    graded at the next driver run, so the enduring backlog is
    never_graded minus the current head."""
    head, tail = registry_order()
    graded = graded_rounds()
    backlog = [q for q in tail if q not in graded]
    assert len(backlog) <= 2, (
        f"never-driver-graded tail backlog {len(backlog)} > 2: {backlog}")


# round-9 rotations INTO the head -- r8 verdict tasks #1/#3/#4/#6:
# nine never-driver-graded queries (incl. the UD5/simulator pair the
# judge named) plus the new versioned-table time-travel query that
# returns F4 quarter bucketing to the head.
R9_ROTATED_IN = [
    "versioned_quarter_audit",
    "cube_status_priority", "count_distinct_parts",
    "quality_top_fraction", "text_line_dedup", "text_unigram_nll",
    "semdedup_embeddings_ivf", "similarity_sq_topk",
    "external_model_scoring", "forecast_revenue",
]


def test_r9_priority_queries_stay_until_twice_graded():
    """Each r9 rotation has one graded round (r9) so far; the >= 2
    rule keeps every one of them in the head through round 10."""
    head, _ = registry_order()
    graded = graded_rounds()
    missing = [q for q in R9_ROTATED_IN
               if len(graded.get(q, [])) < 2 and q not in head]
    assert not missing, f"r9 rotations left the head early: {missing}"


# round-10 rotations INTO the head -- r9 verdict task #1: nine of the
# eleven never-driver-graded tail queries (the other two are the
# documented NEVER_GRADED_OK pair), plus task #2's two new
# capability queries for the last pytest-only r9 sub-tiers.
R10_ROTATED_IN = [
    "text_repetition", "deterministic_split",
    "similarity_topk_batch", "chunk_documents", "vocab_top_tokens",
    "text_boilerplate_share", "dedup_chunk_overlap",
    "corpus_profile_by_source", "decontaminate_embeddings_docs",
    "versioned_table_audit", "drift_ks_summary",
]


def test_r10_priority_queries_stay_until_twice_graded():
    """Same discipline as the r9 set: an r10 rotation may leave the
    head only after >= 2 graded rounds (r12 rotated out the r10+r11
    twice-graded ones for the DataSource-tier slots)."""
    head, _ = registry_order()
    graded = graded_rounds()
    missing = [q for q in R10_ROTATED_IN
               if len(graded.get(q, [])) < 2 and q not in head]
    assert not missing, f"r10 rotations left the head early: {missing}"


def test_remaining_never_graded_are_documented():
    """After the r10 burn-down the only never-driver-graded tail
    entries are the two documented in NEVER_GRADED_OK."""
    from tools.grading_ledger import NEVER_GRADED_OK

    head, tail = registry_order()
    graded = graded_rounds()
    backlog = {q for q in tail if q not in graded}
    assert backlog <= set(NEVER_GRADED_OK), (
        f"undocumented never-graded tail entries: "
        f"{backlog - set(NEVER_GRADED_OK)}")


def test_every_survey_row_keeps_a_head_representative():
    """r8 verdict #3: F4 went head-unrepresented in round 8; the
    query->SURVEY-row mapping (from @register family tags) now makes
    that a check failure.  Asserts through the SAME
    uncovered_survey_rows() the tool's --check runs."""
    from tools.grading_ledger import uncovered_survey_rows

    assert uncovered_survey_rows() == {}


def test_query_rows_mapping_parses_every_registry_entry():
    """The source-regex parser behind the coverage check must see the
    whole registry -- a silently-missed @register would exempt that
    query from the coverage rule."""
    from esg_decarbonization_data_integration_and_data_pipline_spark.plans.queries import REGISTRY
    from tools.grading_ledger import query_rows

    assert set(query_rows()) == set(REGISTRY)


def test_ledger_tool_check_passes():
    import tools.grading_ledger as gl

    proc = subprocess.run(
        [sys.executable, gl.__file__, "--check"],
        capture_output=True, text=True)
    assert proc.returncode == 0, proc.stderr
