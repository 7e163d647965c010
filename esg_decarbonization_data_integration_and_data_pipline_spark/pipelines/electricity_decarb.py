"""raw->staging electricity job: solar-adjusted totals + YTM + rollup.

Semantics (reference: jobs/raw_to_staging.py:921-977
'electricity_decarb' branch): combine grid electricity with
self-generated solar per (site, month), compute the year-to-month
cumulative sum, roll up site -> BO -> ALL with literal 'ALL' labels
(cal_bo_site, jobs/raw_to_staging.py:14-59), and write the current+
prior-year window idempotently.

Spark shape: broadcast dim join, ONE window for YTM, ONE rollup pass
for all levels; the reference's per-level group-bys and per-month
DELETE loop disappear.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, functions as F

from esg_decarbonization_data_integration_and_data_pipline_spark.operators.rollup import rollup_all
from esg_decarbonization_data_integration_and_data_pipline_spark.operators.windows import ytm_cumsum
from esg_decarbonization_data_integration_and_data_pipline_spark.functions.calendar import (
    period_year_window,
)


def electricity_decarb(tables: dict[str, DataFrame],
                       run_date: dt.date) -> DataFrame:
    """tables: electricity_total(site, amount, period_start),
    solar(site, amount, period_start), plant_mapping(site, bo).

    Output: (bo, site, amount, ytm_amount, period_start, unit) with
    site/bo rollup rows labelled 'ALL'.
    """
    start, end = period_year_window(run_date)
    elec = (tables["electricity_total"]
            .filter(F.col("period_start").between(F.lit(start), F.lit(end)))
            .groupBy("site", "period_start").agg(F.sum("amount").alias("amount")))
    solar = (tables["solar"]
             .filter(F.col("period_start").between(F.lit(start), F.lit(end)))
             .groupBy("site", "period_start").agg(F.sum("amount").alias("amount")))

    # grid + self-generated solar; a site missing either side
    # contributes the present one (outer join + coalesced add)
    both = (elec.join(solar.withColumnRenamed("amount", "solar_amt"),
                      ["site", "period_start"], "full_outer")
                .withColumn("amount",
                            F.coalesce("amount", F.lit(0.0))
                            + F.coalesce("solar_amt", F.lit(0.0)))
                .select("site", "period_start", "amount"))

    # unmapped sites get a sentinel that CANNOT collide with the
    # rollup's literal 'ALL' label (esgi_ingest uses the same)
    bo = tables["plant_mapping"].select("site", "bo").distinct()
    with_bo = both.join(F.broadcast(bo), "site", "left") \
                  .na.fill({"bo": "UNKNOWN"})

    with_year = with_bo.withColumn("year", F.year("period_start"))
    ytm = ytm_cumsum(with_year, ["bo", "site", "year"], "period_start",
                     "amount")

    rolled = rollup_all(
        ytm, ["bo", "site"], ["period_start"],
        [F.sum("amount").alias("amount"),
         F.sum("ytm_amount").alias("ytm_amount")])
    return (rolled.withColumn("unit", F.lit("度"))
                  .select("bo", "site", "amount", "ytm_amount",
                          "period_start", "unit"))
