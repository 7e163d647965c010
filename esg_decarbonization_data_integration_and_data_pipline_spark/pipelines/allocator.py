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
                    lot_size: float | None = None) -> DataFrame:
    """offers(year, source_id, price, available);
    targets(year, target_amount).

    Allocates each year's target over its offers in (price asc,
    source_id asc) order; optional ``lot_size`` floors each take to
    whole lots (the reference's REC 1000-unit rule,
    Model/RE_purpose_optimizer.py:284-285).

    Output: (year, source_id, price, available, rank, allocated,
    cum_allocated).
    """
    joined = offers.join(targets, "year", "inner")

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
        out = pdf[["year", "source_id", "price", "available"]].copy()
        out["rank"] = range(1, len(pdf) + 1)
        out["allocated"] = allocated
        out["cum_allocated"] = cums
        return out

    schema = ("year int, source_id string, price double, available double, "
              "rank int, allocated double, cum_allocated double")
    return joined.groupBy("year").applyInPandas(alloc, schema)
