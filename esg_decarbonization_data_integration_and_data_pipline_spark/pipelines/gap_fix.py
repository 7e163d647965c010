"""Gap-fix job: synthesize zero rows for sites that went silent.

Semantics (reference: jobs/fix_data.py:32-106 fix_raw): a site that
reported N months ago but is missing in the processing month gets a
synthesized 0-amount row so downstream YTM/rollup series stay dense.
The reference diffs Python sets; here it is an anti-join (J9) plus a
literal attach -- fully distributed, no collect.

Also carries the source-priority reconciliation (reference:
jobs/fix_data.py:351-359): CSR values win, ESGI fills gaps -- the
coalescing outer join operator.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, functions as F

from esg_decarbonization_data_integration_and_data_pipline_spark.operators.joins import (
    anti_join, coalescing_outer_join,
)


def synthesize_missing_sites(observations: DataFrame, period: dt.date,
                             reference_period: dt.date,
                             key_cols: tuple[str, ...] = ("site",),
                             amount_col: str = "amount") -> DataFrame:
    """Rows of ``observations`` at ``period`` plus synthesized
    zero-amount rows for keys present at ``reference_period`` but
    absent at ``period``."""
    cur = observations.filter(F.col("period_start") == F.lit(period))
    ref = observations.filter(F.col("period_start") == F.lit(reference_period))
    missing = anti_join(ref.select(*key_cols).distinct(),
                        cur.select(*key_cols).distinct(), key_cols)
    synthesized = (missing
                   .withColumn(amount_col, F.lit(0.0))
                   .withColumn("period_start", F.lit(period))
                   .withColumn("synthesized", F.lit(True)))
    return (cur.withColumn("synthesized", F.lit(False))
               .select(*key_cols, amount_col, "period_start", "synthesized")
               .unionByName(synthesized))


def reconcile_sources(primary: DataFrame, secondary: DataFrame,
                      keys: tuple[str, ...] = ("site", "period_start"),
                      amount_col: str = "amount") -> DataFrame:
    """Primary-wins outer merge of two observation feeds (the CSR-
    over-ESGI rule) -- one coalesce projection instead of the
    reference's row loop."""
    return coalescing_outer_join(primary, secondary, list(keys), [amount_col])
