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

from esg_decarbonization_data_integration_and_data_pipline_spark.functions.recode import recode
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


SOLAR_SITE_RECODE = {"WIHK1": "WIHK", "WIHK2": "WIHK",
                     "WMYP1": "WMY", "WMYP2": "WMY"}
SOLAR_CATEGORY_RECODE = {"太陽能發電量": "光伏"}





def solar_csr_feed(tables: dict[str, DataFrame]) -> DataFrame:
    """Federated CSR solar generation feed (reference:
    jobs/csr_etl.py:122-201 csr_solar_replace): the HQ indicator view
    and the CSR raw-data view normalize into one raw.solar slice --
    site/category recodes, the second feed pre-summed per (site,
    year, month) and labeled 光伏, month-start period build, constant
    category1/unit/type stamps. The reference's month loop plus
    per-site DELETE loop collapse into one plan; the caller upserts
    with replace_keys(site, period_start, category2).

    tables:
    csr_view(site, year, month, category2, amount) -- HQ sites,
    csr_raw(site, year, month, amount)             -- other sites.
    """
    a = (tables["csr_view"]
         .filter(F.col("amount") > 0)
         .na.drop()
         .withColumn("category2",
                     recode("category2", SOLAR_CATEGORY_RECODE)))
    # recode sites BEFORE the pre-sum: WIHK1+WIHK2 must land as ONE
    # (WIHK, month) row, or the upsert key (site, period_start,
    # category2) holds duplicate rows
    b = (tables["csr_raw"]
         .filter(F.col("amount") > 0)
         .na.drop()
         .withColumn("site", recode("site", SOLAR_SITE_RECODE))
         .groupBy("site", "year", "month")
         .agg(F.sum("amount").alias("amount"))
         .withColumn("category2", F.lit("光伏")))
    u = (a.unionByName(b)
          .withColumn("site", recode("site", SOLAR_SITE_RECODE))
          .withColumn("period_start",
                      F.make_date("year", "month", F.lit(1))))
    return u.select(
        F.lit("綠色能源").alias("category1"), "category2", "amount",
        "site", "period_start", F.lit("CSR").alias("type"),
        F.lit("度").alias("unit"))
