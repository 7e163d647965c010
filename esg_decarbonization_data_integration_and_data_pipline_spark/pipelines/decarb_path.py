"""Decarbonization-path forecast table (app.decarb_path).

Semantics (reference: jobs/decarb_path_etl.py:11-112):

- take the AI-simulated electricity per (site, year) from the row set
  carrying BOTH the global max version and the global max
  version_year (two independent whole-table scalar subqueries,
  :19-21);
- join per-(site, year) carbon coefficients (site aliases recoded,
  duplicates dropped, :27-34);
- split the implied carbon into five categories using the renewable
  share settings (category in REC/PPA/solar, ratio = amount/100):
    Scope 2 location-based uses 1 - (PPA + solar),
    Scope 1            = location-based x 0.06 / (1 - 0.06),
    Scope 2 market     uses 1 - (REC + PPA + solar),
    RECs / Solar Power Generation / PPA use their own shares;
  each summed per year, amount = elec x coef x ratio / 1000
  (:37-94);
- union with category labels, unit 'Tonnes CO2e', version =
  version_year, type = 'target' (:97-101).

Spark shape: the five pandas merge+groupby passes collapse into ONE
per-year aggregation of elec x coef joined to a pivoted per-year
ratio row (broadcast — years are few), then five scalar multiplies
unioned via a ratio-spec unpivot. A year missing from a category's
settings contributes 0.0 for that category (the reference's NaN
ratio -> skipna sum), expressed as null-propagating ratios filled at
the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from esg_decarbonization_data_integration_and_data_pipline_spark.functions.recode import recode

SITE_RECODE = {"WIHK1": "WIHK-1", "WIHK2": "WIHK-2",
               "WMYP1": "WMY", "WMYP2": "WMY"}
_SCOPE1_FACTOR = 0.06 / (1 - 0.06)


def decarb_path(tables: dict[str, DataFrame]) -> DataFrame:
    """tables:
    simulate(site, year, amount, version, version_year),
    renewable_setting(year, category, amount)  -- percent values,
    coef(site, year, amount).

    Returns (year, amount, category, unit, version, type) rows for
    the five decarb-path categories.
    """
    sim = tables["simulate"]
    maxes = sim.agg(F.max("version").alias("__v"),
                    F.max("version_year").alias("__vy"))
    latest = (sim.crossJoin(F.broadcast(maxes))
              .filter((F.col("version") == F.col("__v"))
                      & (F.col("version_year") == F.col("__vy")))
              .select("site", "year", "amount", "version_year"))

    coef = (tables["coef"]
            .withColumn("site", recode("site", SITE_RECODE))
            .select("site", "year", F.col("amount").alias("coef"))
            .dropDuplicates())

    # one pass: per-year sum of elec x coef (ratios are year-scalars,
    # so multiplying after the sum equals the reference's per-site
    # multiply-then-sum)
    base = (latest.join(coef, ["site", "year"], "left")
            .groupBy("year", "version_year")
            .agg((F.sum(F.col("amount") * F.col("coef")) / 1000)
                 .alias("base")))

    ratios = (tables["renewable_setting"]
              .filter(F.col("category").isin("REC", "PPA", "solar"))
              .groupBy("year")
              .pivot("category", ["REC", "PPA", "solar"])
              .agg(F.sum(F.col("amount") / 100)))

    rec, ppa, sol = F.col("REC"), F.col("PPA"), F.col("solar")
    z = lambda c: F.coalesce(c, F.lit(0.0))  # noqa: E731
    loc_ratio = F.when(ppa.isNotNull() | sol.isNotNull(),
                       1 - z(ppa) - z(sol))
    mkt_ratio = F.when(rec.isNotNull() | ppa.isNotNull() | sol.isNotNull(),
                       1 - z(rec) - z(ppa) - z(sol))
    specs = [("Scope 1", loc_ratio * _SCOPE1_FACTOR),
             ("Scope 2 (Scope 2-REC)", mkt_ratio),
             ("RECs", rec),
             ("Solar Power Generation", sol),
             ("PPA", ppa)]

    with_ratios = base.join(F.broadcast(ratios), "year", "left")
    rows = with_ratios.select(
        "year", "version_year",
        F.stack(F.lit(len(specs)),
                *[x for name, ratio in specs
                  for x in (F.lit(name), F.col("base") * ratio)])
        .alias("category", "amount"))
    return (rows
            .select("year",
                    F.coalesce(F.col("amount"), F.lit(0.0)).alias("amount"),
                    "category",
                    F.lit("Tonnes CO2e").alias("unit"),
                    F.col("version_year").alias("version"),
                    F.lit("target").alias("type")))
