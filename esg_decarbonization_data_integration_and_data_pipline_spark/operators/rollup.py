"""Hierarchy rollups with literal 'ALL' labels (SURVEY.md A6).

The reference hand-builds GROUPING SETS: aggregate at the detail
level, aggregate again at a coarser level with the rolled-up dims set
to the literal string ``'ALL'``, and union the two (reference:
jobs/raw_to_staging.py:14-59 ``cal_bo_site``, :61-86 ``cal_site``).

Spark's native ``rollup()`` computes every prefix level in ONE pass
(map-side partial aggregation, single shuffle) and tags levels via
``grouping()``; we then coalesce rolled-up dims to 'ALL'. This beats
the reference's N separate group-bys and is the plan that survives a
100x scale-up: one shuffle regardless of how many levels.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def rollup_all(df: DataFrame, rollup_keys: Sequence[str],
               fixed_keys: Sequence[str], aggs: Sequence[Column],
               label: str = "ALL", include_grand_total: bool = True) -> DataFrame:
    """Rollup over ``rollup_keys`` with rolled-up dims emitted as the
    literal ``label``, while ``fixed_keys`` stay at full detail in
    every output row (the reference always keeps period_start/year
    fixed and rolls up site/bo).

    Output row-set = detail rows + one row-set per rollup prefix
    level (+ optionally the grand total over all rollup_keys) --
    exactly the reference's union-of-groupbys, as an unordered set.
    """
    rollup_keys = list(rollup_keys)
    fixed_keys = list(fixed_keys)
    # rollup() emits every key-list prefix, so the fixed keys go FIRST:
    # rollup(f.., r1, r2) -> levels (f..,r1,r2), (f..,r1), (f..), ...
    # and the levels that roll up a fixed key are filtered out below.
    all_keys = fixed_keys + rollup_keys
    gcols = [F.grouping(k).alias(f"__g_{k}") for k in all_keys]
    out = df.rollup(*all_keys).agg(*gcols, *aggs)
    keep = F.lit(True)
    for k in fixed_keys:
        keep = keep & (F.col(f"__g_{k}") == 0)
    if not include_grand_total and rollup_keys:
        keep = keep & (F.col(f"__g_{rollup_keys[0]}") == 0)
    out = out.filter(keep)
    for k in rollup_keys:
        out = out.withColumn(
            k, F.when(F.col(f"__g_{k}") == 1, F.lit(label)).otherwise(F.col(k)))
    return out.drop(*[f"__g_{k}" for k in all_keys])
