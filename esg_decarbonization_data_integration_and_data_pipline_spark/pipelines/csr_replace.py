"""CSR replacement job: authoritative-source overwrite of raw slices.

Semantics (reference: jobs/csr_etl.py:43-119 csr_replace): from
2023-01 onward, values from the corporate CSR database overwrite the
locally-ingested figures month by month, per site; months/sites the
CSR feed lacks keep their local values. The reference loops months
and sites issuing per-slice DELETEs (S9); here the whole window is
one coalescing merge + one keyed write.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, functions as F

from esg_decarbonization_data_integration_and_data_pipline_spark.operators.joins import (
    coalescing_outer_join,
)


def csr_replace(tables: dict[str, DataFrame],
                since: dt.date) -> DataFrame:
    """tables: local(site, amount, period_start, type),
    csr(site, amount, period_start).

    Output: the raw table content for period_start >= since with CSR
    values winning per (site, month); rows sourced from CSR are
    tagged type='CSR', surviving local rows keep their tag.
    """
    local = tables["local"].filter(F.col("period_start") >= F.lit(since))
    csr = (tables["csr"].filter(F.col("period_start") >= F.lit(since))
           .select("site", "period_start",
                   F.col("amount").alias("amount"),
                   F.lit("CSR").alias("type")))
    merged = coalescing_outer_join(
        csr, local.select("site", "period_start", "amount", "type"),
        ["site", "period_start"], ["amount", "type"])
    return merged.select("site", "period_start", "amount", "type")
