"""Financial grouped aggregates (SURVEY.md A8/UD3, §4.2.4).

The reference computes per-(plant, bo) trend rates with numpy-
financial IRR and a CAGR lambda inside pandas groupby.agg
(reference: Model/Factory_elect_simulator_update.py:194-211,219-222).
Here:

- CAGR is pure SQL (min_by/max_by + pow) -- no Python at all;
- IRR keeps a Python kernel (root finding has no SQL form) wrapped in
  an Arrow-batched applyInPandas; deterministic bisection, not a
  library solver, so results are reproducible anywhere.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F


def cagr_agg(value_col: str, year_col: str) -> Column:
    """CAGR over a yearly series as a single aggregate expression:
    (last/first)^(1/(years-1)) - 1, ties on year resolved by the
    engine's min_by/max_by semantics (unique years per group in all
    reference uses)."""
    return (
        F.pow(F.expr(f"max_by({value_col}, {year_col})")
              / F.expr(f"min_by({value_col}, {year_col})"),
              1.0 / F.nullif(F.max(year_col) - F.min(year_col), F.lit(0)))
        - 1)


def npv(rate: float, cashflows: Sequence[float]) -> float:
    return sum(c / (1 + rate) ** t for t, c in enumerate(cashflows))


def irr_bisect(cashflows: Sequence[float], lo: float = -0.99,
               hi: float = 10.0, iters: int = 80) -> float:
    """Deterministic bisection IRR (NPV root). Assumes one sign change
    in the cashflow series, as the reference's usage guarantees."""
    for _ in range(iters):
        mid = (lo + hi) / 2
        if npv(lo, cashflows) * npv(mid, cashflows) <= 0:
            hi = mid
        else:
            lo = mid
    return (lo + hi) / 2


def grouped_irr(df: DataFrame, group_cols: Sequence[str], year_col: str,
                value_col: str, out_col: str = "irr") -> DataFrame:
    """IRR per group over the year-ordered value series, first value
    negated as the outlay (the reference's cashflow convention)."""
    group_cols = list(group_cols)

    def one(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(year_col)
        cf = pdf[value_col].to_numpy().copy()
        cf[0] = -abs(cf[0]) * float(len(cf))
        keys = {c: [pdf[c].iloc[0]] for c in group_cols}
        keys[out_col] = [round(irr_bisect(list(cf)), 6)]
        return pd.DataFrame(keys)

    fields = ", ".join(f"{c} string" for c in group_cols)
    return df.groupBy(*group_cols).applyInPandas(
        one, f"{fields}, {out_col} double")
