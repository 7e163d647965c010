"""raw->staging solar family: the four solar tables.

Semantics (reference: jobs/raw_to_staging.py:304-660):
- staging.solar: plant-level actual/target amounts -> site enrich,
  YTM per (site, plant, category) (reference :304-341)
- staging.solar_remain: remaining-capacity rows whose site field may
  carry combined codes ('WKS/XTRKS') that fan out into one row per
  site, splitting the amount evenly (reference :377-450)
- staging.solar_other: wide (tree, fuel) measure columns melted into
  category rows then YTM'd -- the pivot_table+melt R3 shape
  (reference :489-565)
- staging.solar_info: category amounts without a period column get
  the processing month stamped (reference :589-660)
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, functions as F

from esg_decarbonization_data_integration_and_data_pipline_spark.functions.calendar import (
    processing_window,
)
from esg_decarbonization_data_integration_and_data_pipline_spark.operators.reshape import melt
from esg_decarbonization_data_integration_and_data_pipline_spark.operators.windows import ytm_cumsum


def solar_staging(tables: dict[str, DataFrame]) -> DataFrame:
    """raw solar (plant, category, amount, period_start) + mapping
    (site, plant) -> YTM'd staging.solar."""
    s = (tables["solar"]
         .join(F.broadcast(tables["plant_mapping"].select("site", "plant")
                           .distinct()), "plant", "left")
         .groupBy("site", "plant", "category",
                  F.col("period_start"),
                  F.year("period_start").alias("year"))
         .agg(F.sum("amount").alias("amount")))
    out = ytm_cumsum(s, ["site", "plant", "category", "year"],
                     "period_start", "amount")
    return out.select("site", "plant", "category", "amount",
                      "ytm_amount", "period_start")


def solar_remain_staging(tables: dict[str, DataFrame]) -> DataFrame:
    """Fan combined site codes out to per-site rows, splitting the
    amount evenly across the components."""
    r = tables["solar_remain"]
    r = (r.withColumn("__sites", F.split(F.col("site"), "/"))
          .withColumn("__n", F.size("__sites"))
          .withColumn("site", F.explode("__sites"))
          .withColumn("amount", F.col("amount") / F.col("__n"))
          .drop("__sites", "__n"))
    with_year = r.withColumn("year", F.year("period_start"))
    out = ytm_cumsum(
        with_year.groupBy("site", "year", "period_start")
                 .agg(F.sum("amount").alias("amount")),
        ["site", "year"], "period_start", "amount")
    return out.select("site", "amount", "ytm_amount", "period_start")


def solar_other_staging(tables: dict[str, DataFrame]) -> DataFrame:
    """Wide (tree, fuel) columns -> long category rows -> YTM."""
    o = tables["solar_other"]
    long = melt(o, ["site", "period_start"], ["tree", "fuel"],
                var_name="category", value_name="amount")
    with_year = long.withColumn("year", F.year("period_start"))
    out = ytm_cumsum(
        with_year.groupBy("site", "category", "year", "period_start")
                 .agg(F.sum("amount").alias("amount")),
        ["site", "category", "year"], "period_start", "amount")
    return out.select("site", "category", "amount", "ytm_amount",
                      "period_start")


def solar_info_staging(tables: dict[str, DataFrame],
                       run_date: dt.date) -> DataFrame:
    """Period-less category amounts stamped with the processing
    month (injected run_date, never now())."""
    start, _ = processing_window(run_date)
    return (tables["solar_info"]
            .withColumn("period_start", F.lit(start))
            .select("site", "plant", "category", "amount", "period_start"))
