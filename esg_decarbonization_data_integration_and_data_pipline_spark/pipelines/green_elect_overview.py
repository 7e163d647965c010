"""Green-electricity overview assembly (app.green_elect_overview).

Semantics (reference: jobs/staging_to_app.py:772-1062, the
``green_elect_overview`` branch, active paths only):

- monthly frame df1 = four-way OUTER merge on (site, period_start) of
  provider green targets, total-electricity targets (packaged sites
  WZS/WKS/WIHK summed to site level first), actual totals
  (electricity_decarb bo='ALL' site rows) and actual green volumes
  (renewable_energy_decarb, category='green_electricity') (:778-824);
  the *_all columns are then summed per period over every site and
  attached back to each row (:826-831) -- a grand-total cross join;
- yearly frame df3 = per-(site, provider) year target sums from the
  provider plant list, outer-merged with the fleet-wide target from
  the latest validated simulate version (:952-975);
- enrichment: green price diff and carbon coef per site (site
  aliases recoded, duplicates dropped), unit cost-per-carbon ratios
  ``(actual/1000*coef) / (actual/1000*price_diff)`` (:996-1022),
  area mapping join, year/month extraction, and the
  ``actual_ytm != 0`` / area-not-null filters (:988,1024-1041).

Spark shape: the month-loop disappears (period_start is a join key
throughout); outer joins stay equi-joins; the per-period grand total
is a partial aggregation joined back (broadcast, few rows per
period); latest-version selection is the shared window-rank helper.
Zero denominators yield NULL (engine-wide nullif choice; the
reference's fillna(0) then 0/0 produces NaN which its write drops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from esg_decarbonization_data_integration_and_data_pipline_spark.functions.recode import recode

from esg_decarbonization_data_integration_and_data_pipline_spark.operators.windows import latest_version

SITE_RECODE = {"WIHK1": "WIHK", "WIHK2": "WIHK", "WIHK-1": "WIHK",
               "WIHK-2": "WIHK", "WMIP1": "WMI", "WMIP2": "WMI",
               "WMYP1": "WMY"}


def _recode_site(df: DataFrame) -> DataFrame:
    return df.withColumn("site", recode("site", SITE_RECODE))


def green_elect_overview(tables: dict[str, DataFrame],
                         packaged_sites: tuple[str, ...] = ("WZS", "WKS",
                                                            "WIHK")) -> DataFrame:
    """tables:
    provider_target(site, target, target_ytm, period_start),
    elect_total(site, plant, category, amount, ytm_amount, period_start),
    electricity_decarb(site, bo, amount, ytm_amount, period_start),
    renewable_energy_decarb(site, bo, category, amount, ytm_amount,
                            period_start),
    year_target(site, provider, year, month, amount),
    simulate(site, year, version, version_year, validate, amount),
    green_price(site, amount),     -- price diff per site, one year
    coef(site, amount),            -- carbon coef per site, one year
    area_mapping(site, nation, area),
    plus scalar config: target_year (int) aligning year_target /
    simulate slices.

    Returns one row per (site, provider, period) with target/actual/
    fleet-total/price/unit/area columns, filtered to actual_ytm != 0
    and known area.
    """
    target_year = int(tables["target_year"])
    packaged = F.col("site").isin(*packaged_sites)

    # --- df1: monthly site frame -------------------------------------
    provider_target = tables["provider_target"]
    et = (tables["elect_total"].filter(F.col("category") == "target"))
    et_regular = (et.filter(~packaged)
                  .select("site", "period_start",
                          F.col("amount").alias("target_all"),
                          F.col("ytm_amount").alias("target_ytm_all")))
    et_packaged = (et.filter(packaged)
                   .groupBy("site", "period_start")
                   .agg(F.sum("amount").alias("target_all"),
                        F.sum("ytm_amount").alias("target_ytm_all")))
    elect_total_target = et_regular.unionByName(et_packaged)

    elect_actual = (tables["electricity_decarb"]
                    .filter((F.col("bo") == "ALL") & (F.col("site") != "ALL"))
                    .select("site", "period_start",
                            F.col("amount").alias("actual_all"),
                            F.col("ytm_amount").alias("actual_ytm_all")))
    green_vol = (tables["renewable_energy_decarb"]
                 .filter((F.col("bo") == "ALL") & (F.col("site") != "ALL")
                         & (F.col("category") == "green_electricity"))
                 .select("site", "period_start",
                         F.col("amount").alias("actual"),
                         F.col("ytm_amount").alias("actual_ytm")))

    df1 = (provider_target
           .join(elect_total_target, ["site", "period_start"], "full_outer")
           .join(elect_actual, ["site", "period_start"], "full_outer")
           .join(green_vol, ["site", "period_start"], "full_outer"))

    # fleet-wide *_all sums per period, attached back to every row
    df1_all = (df1.na.fill({"target_all": 0.0, "target_ytm_all": 0.0,
                            "actual_all": 0.0, "actual_ytm_all": 0.0})
               .groupBy("period_start")
               .agg(F.sum("target_all").alias("target_all"),
                    F.sum("target_ytm_all").alias("target_ytm_all"),
                    F.sum("actual_all").alias("actual_all"),
                    F.sum("actual_ytm_all").alias("actual_ytm_all")))
    df1 = (df1.select("site", "period_start", "target", "target_ytm",
                      "actual", "actual_ytm")
           .join(F.broadcast(df1_all), "period_start", "left")
           .na.fill(0.0))

    # --- df3: yearly targets -----------------------------------------
    year_target = (tables["year_target"]
                   .filter(F.col("year") == target_year)
                   .groupBy("site", "provider")
                   .agg(F.sum("amount").alias("year_target")))
    sim = tables["simulate"].filter((F.col("year") == target_year)
                                    & (F.col("version_year") == target_year)
                                    & F.col("validate"))
    sim_latest = latest_version(sim, [], [F.col("version").desc()])
    year_target_all = sim_latest.agg(F.sum("amount").alias("year_target_all"))
    df3 = year_target.crossJoin(F.broadcast(year_target_all))

    green_elect = (df1.join(df3, ["site"], "full_outer")
                   .filter(F.col("actual_ytm") != 0))

    # --- price / coef / unit -----------------------------------------
    green_price = (_recode_site(tables["green_price"])
                   .select("site", F.col("amount").alias("price_diff"),
                           F.col("amount").alias("price_diff_ytm"))
                   .dropDuplicates())
    coef = (_recode_site(tables["coef"])
            .select("site", F.col("amount").alias("coef"))
            .dropDuplicates())
    price_coef = green_price.join(coef, "site", "left")

    out = (green_elect.join(F.broadcast(price_coef), "site", "left")
           .na.fill({"price_diff": 0.0, "price_diff_ytm": 0.0, "coef": 0.0,
                     "year_target": 0.0, "year_target_all": 0.0}))
    kwh = F.col("actual") / 1000
    kwh_ytm = F.col("actual_ytm") / 1000
    out = (out.withColumn("unit", (kwh * F.col("coef"))
                          / F.nullif(kwh * F.col("price_diff"), F.lit(0.0)))
              .withColumn("unit_ytm", (kwh_ytm * F.col("coef"))
                          / F.nullif(kwh_ytm * F.col("price_diff_ytm"),
                                     F.lit(0.0))))

    area = tables["area_mapping"].select("site", "nation", "area").distinct()
    return (out.join(F.broadcast(area), "site", "left")
            .withColumn("year", F.year("period_start"))
            .withColumn("month", F.month("period_start"))
            .filter(F.col("area").isNotNull())
            .select("site", "year", "month", "target", "target_ytm",
                    "target_all", "target_ytm_all", "actual_all",
                    "actual_ytm_all", "actual", "actual_ytm", "year_target",
                    "year_target_all", "price_diff", "price_diff_ytm",
                    "unit", "unit_ytm", "area", "provider"))
