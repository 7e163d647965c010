"""Skew-mitigation join helper (SURVEY.md §4 'Partitioning & shuffle').

AQE's skew-join splitting (on in session.py) handles most skew at
runtime; this explicit salting operator is for the pathological case
it cannot fix -- a sort-merge/shuffle-hash join where ONE key holds a
double-digit percentage of the fact table and the dim side is too
big to broadcast. Salting replicates each right-side key row N ways
and scatters the left side across the N salts, so the hot key's rows
spread over N tasks instead of one straggler.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def salted_join(left: DataFrame, right: DataFrame, on: Sequence[str],
                n_salts: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join with key salting: left rows get a deterministic salt
    in [0, n_salts) (hash of all columns -- uniform, reproducible);
    right rows are replicated once per salt. Output columns match a
    plain ``left.join(right, on, how)``.

    Cost model: right side is duplicated n_salts times -- use ONLY
    when the skewed key's share of the left side exceeds ~1/n_tasks
    and broadcast is impossible; otherwise prefer AQE.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        # right/full outer would emit one unmatched copy PER SALT
        raise ValueError(
            f"salted_join supports {sorted(allowed)}; '{how}' would "
            "duplicate unmatched right rows once per salt")
    on = list(on)
    # salt must spread IDENTICAL duplicate rows of a hot key too (the
    # duplicate-heavy case is exactly where skew bites), so it comes
    # from a uniform per-row draw, not a content hash; any salt value
    # is correct because the right side carries every salt.
    lsalted = left.withColumn(
        "__salt", F.floor(F.rand(seed=42) * n_salts).cast("int"))
    rsalted = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    out = lsalted.join(rsalted, on + ["__salt"], how)
    return out.drop("__salt")
