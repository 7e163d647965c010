"""Pivot / unpivot reshape operators (SURVEY.md §2.8 R1-R3).

Reference shapes:
- melt wide-month columns (jan..dec) to long rows
  (reference: jobs/staging_cal.py:263-265; jobs/raw_to_staging.py:495-517)
- pivot account_name long->wide
  (reference: Model/Factory_elect_simulator_update.py:47-48,65-66)
- pivot_table(sum) + melt (reference: jobs/raw_to_staging.py:493-496)

Scale notes: ``unpivot`` is a narrow (no-shuffle) transform. Pivot
with an explicit ``values=`` list skips the extra distinct-values job
Spark otherwise runs and keeps the agg a single shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def melt(df: DataFrame, id_vars: Sequence[str], value_vars: Sequence[str],
         var_name: str = "variable", value_name: str = "value") -> DataFrame:
    """Wide -> long unpivot (R1), pandas.melt semantics."""
    return df.unpivot(list(id_vars), list(value_vars), var_name, value_name)


def pivot_wide(df: DataFrame, index: Sequence[str], pivot_col: str,
               agg: Column, values: Sequence[str] | None = None) -> DataFrame:
    """Long -> wide pivot (R2/R3).

    Pass ``values`` explicitly whenever the category domain is known
    (it always is in the reference: account names, month numbers) --
    avoids a full pass to discover distinct pivot values.
    """
    p = df.groupBy(*index).pivot(pivot_col, list(values) if values else None)
    return p.agg(agg)
