"""Multi-year electricity/renewable target projection.

Semantics (reference: jobs/elect_target_etl.py:178-295
decarb_renew_setting_etl): for each year in [run_year, run_year+7]
compute the scope target = consumption x renewable-ratio-path x
carbon coefficient / 1000, plus percent change vs the base year
(cross-join scalar) and the previous year.

Spark shape: the reference's 8-iteration Python year loop becomes an
explode over sequence(0, horizon) -- one plan for all years; the
base-year comparison is a broadcast scalar attach (J4), the
previous-year comparison a lag window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from esg_decarbonization_data_integration_and_data_pipline_spark.operators.joins import attach_scalar


def renew_targets(tables: dict[str, DataFrame], run_year: int,
                  horizon: int = 7, base_year: int | None = None) -> DataFrame:
    """tables:
    consumption(site, year, amount)   -- latest actual consumption,
    ratio_path(year, renewable_ratio) -- target renewable share/year,
    carbon_coef(site, year, coef).

    Output per (site, year in run_year..run_year+horizon):
    target_renewable, scope2_target, pct_vs_base, pct_vs_prev.
    """
    cons = tables["consumption"]
    latest = (cons.groupBy("site")
                  .agg(F.expr("max_by(amount, year)").alias("amount")))
    years = latest.select(
        "site", "amount",
        F.explode(F.sequence(F.lit(run_year),
                             F.lit(run_year + horizon))).alias("year"))
    joined = (years
              .join(F.broadcast(tables["ratio_path"]), "year", "left")
              .join(F.broadcast(tables["carbon_coef"]), ["site", "year"], "left")
              .na.fill({"renewable_ratio": 0.0}))
    out = (joined
           .withColumn("target_renewable",
                       F.round(F.col("amount") * F.col("renewable_ratio"), 6))
           .withColumn("scope2_target",
                       F.round(F.col("amount")
                               * (1 - F.col("renewable_ratio"))
                               * F.col("coef") / 1000, 6)))
    by = base_year if base_year is not None else run_year
    base = (out.filter(F.col("year") == by)
               .groupBy().agg(F.sum("scope2_target").alias("base_total")))
    w = Window.partitionBy("site").orderBy("year")
    return (attach_scalar(out, base)
            .withColumn("pct_vs_base",
                        F.round((F.col("scope2_target")
                                 / F.nullif(F.col("base_total"), F.lit(0.0))
                                 - 1) * 100, 4))
            .withColumn("pct_vs_prev",
                        F.round((F.col("scope2_target")
                                 / F.nullif(F.lag("scope2_target").over(w),
                                            F.lit(0.0)) - 1) * 100, 4))
            .select("site", "year", "target_renewable", "scope2_target",
                    "pct_vs_base", "pct_vs_prev"))
