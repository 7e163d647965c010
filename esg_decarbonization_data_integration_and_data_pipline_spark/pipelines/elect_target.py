"""Multi-year electricity/renewable target projection.

Semantics (reference: jobs/elect_target_etl.py:178-295
decarb_renew_setting_etl): for each year in [run_year, run_year+7]
compute the scope target = consumption x renewable-ratio-path x
carbon coefficient / 1000, plus percent change vs the base year
(cross-join scalar) and the previous year.

Spark shape: the reference's 8-iteration Python year loop becomes an
explode over sequence(0, horizon) -- one plan for all years; the
base-year comparison is a per-site window reference, the
previous-year comparison a lag window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


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
    w = Window.partitionBy("site").orderBy("year")
    wsite = Window.partitionBy("site")
    # base-year reference is PER SITE (a window max over the site's
    # base-year row), matching pct_vs_prev granularity
    return (out
            .withColumn("site_base",
                        F.max(F.when(F.col("year") == by,
                                     F.col("scope2_target"))).over(wsite))
            .withColumn("pct_vs_base",
                        F.round((F.col("scope2_target")
                                 / F.nullif(F.col("site_base"), F.lit(0.0))
                                 - 1) * 100, 4))
            .withColumn("pct_vs_prev",
                        F.round((F.col("scope2_target")
                                 / F.nullif(F.lag("scope2_target").over(w),
                                            F.lit(0.0)) - 1) * 100, 4))
            .select("site", "year", "target_renewable", "scope2_target",
                    "pct_vs_base", "pct_vs_prev"))
