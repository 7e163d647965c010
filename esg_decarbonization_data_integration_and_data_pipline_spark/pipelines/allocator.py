"""Greedy price-rank allocation (SURVEY.md UD4, §4.2.3).

The reference's renewable-purchase optimizer allocates a yearly
target across purchase options cheapest-first, where each step's
take depends on the cumulative total so far (reference:
Model/RE_purpose_optimizer.py:190-223 PPA, :283-324 REC with
1000-unit lot flooring). Inherently sequential across ranks, so it
cannot be one relational query -- but it IS parallel across years
(and areas): each (year) group is tiny after aggregation, so an
Arrow-batched ``applyInPandas`` per group gives the distributed
shape: shuffle once on the group key, run the greedy loop on a few
rows in-memory, deterministic output.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def greedy_allocate(offers: DataFrame, targets: DataFrame,
                    lot_size: float | None = None,
                    key: str = "year", key_type: str = "int") -> DataFrame:
    """offers(<key>, source_id, price, available);
    targets(<key>, target_amount).

    Allocates each key group's target over its offers in (price asc,
    source_id asc) order; optional ``lot_size`` floors each take to
    whole lots (the reference's REC 1000-unit rule,
    Model/RE_purpose_optimizer.py:284-285). ``key`` defaults to the
    reference's per-year grouping; the transfer-suggestion job
    allocates per site (key_type='string').

    Output: (<key>, source_id, price, available, rank, allocated,
    cum_allocated).
    """
    joined = offers.join(targets, key, "inner")

    def alloc(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["price", "source_id"]).reset_index(drop=True)
        target = float(pdf["target_amount"].iloc[0])
        remaining = target
        allocated, cums = [], []
        cum = 0.0
        for _, row in pdf.iterrows():
            take = min(float(row["available"]), max(remaining, 0.0))
            if lot_size:
                take = (take // lot_size) * lot_size
            remaining -= take
            cum += take
            allocated.append(take)
            cums.append(cum)
        out = pdf[[key, "source_id", "price", "available"]].copy()
        out["rank"] = range(1, len(pdf) + 1)
        out["allocated"] = allocated
        out["cum_allocated"] = cums
        return out

    schema = (f"{key} {key_type}, source_id string, price double, "
              f"available double, rank int, allocated double, "
              f"cum_allocated double")
    return joined.groupBy(key).applyInPandas(alloc, schema)
