"""Solar energy overview assembly (app.solar_energy_overview).

Semantics (reference: jobs/staging_to_app.py:404-585, the active
``solar_energy_overview`` branch):

- the monthly source already nets out surplus power, so the landed
  ``actual`` series is relabeled ``actual_use`` and the true actual is
  reconstructed as ``actual_use + remain`` (:414-438);
- the overview unions six category series -- actual, target, remain,
  actual_use, info, other -- into one long (site, plant, category,
  amount, ytm_amount, period_start) frame (:447-449);
- solar-vs-total-electricity ratios (x100) are computed per
  (site, plant, category in {actual, target}) against
  ``elect_total``, with category recoded by prefixing
  (actual -> solar_ratio_actual / elect_total_actual) (:506-527);
- the packaged sites (WZS/WKS) are instead ratio'd at SITE level --
  both sides summed over plants first -- and emitted with
  plant='ALL' (:530-563), mirroring the staging-layer rollup labels;
- the final union keeps only plants present in the six-series
  overview (:568). Whether the plant='ALL' packaged rows survive that
  whitelist is data-dependent in the reference too: the staging-side
  ALL-rollup append is commented out in the snapshot
  (jobs/raw_to_staging.py:327-330), so ALL rows pass the filter only
  when some input series carries plant='ALL'. The engine keeps the
  same data-dependent behavior rather than special-casing 'ALL'.

Spark shape: unions + one broadcast-able equi-join per ratio branch +
two site-level partial aggregations; the plant whitelist is a
left_semi join against the overview's distinct plants instead of a
collected isin list, so nothing touches the driver. Per-month
slicing in the reference's 12-month loop becomes partition pruning
on period_start when run over the warehouse.

Division semantics: a zero or missing elect_total denominator yields
NULL (nullif), not inf -- documented engine-wide choice.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F

_COLS = ["site", "plant", "category", "amount", "ytm_amount", "period_start"]


def _ratio_pct(num: str, den: str):
    return F.col(num) / F.nullif(F.col(den), F.lit(0.0)) * 100


def solar_overview(tables: dict[str, DataFrame],
                   packaged_sites: tuple[str, ...] = ("WZS", "WKS"),
                   excluded_sites: tuple[str, ...] = ("WIHK",)) -> DataFrame:
    """tables:
    solar(site, plant, category in {actual,target}, amount,
          ytm_amount, period_start)  -- may carry plant='ALL' rollups,
    solar_remain(site, plant, amount, ytm_amount, period_start),
    solar_info / solar_other -- same shape as solar,
    elect_total -- same shape as solar.

    Returns the long overview frame with categories: actual, target,
    remain, actual_use, info/other passthroughs, elect_total_{actual,
    target} and solar_ratio_{actual,target} (plant='ALL' rows for the
    packaged sites).
    """
    solar = tables["solar"]
    remain = (tables["solar_remain"]
              .withColumn("category", F.lit("remain"))
              .na.fill({"amount": 0.0, "ytm_amount": 0.0})
              .select(*_COLS))
    info = tables["solar_info"].select(*_COLS)
    other = tables["solar_other"].select(*_COLS)
    elect_total = tables["elect_total"]

    actual_use = (solar.filter(F.col("category") == "actual")
                  .withColumn("category", F.lit("actual_use"))
                  .select(*_COLS))
    target = solar.filter(F.col("category") == "target").select(*_COLS)

    # actual = actual_use + remain (source already nets out surplus)
    r = remain.select("site", "plant", "period_start",
                      F.col("amount").alias("r_amount"),
                      F.col("ytm_amount").alias("r_ytm"))
    actual = (actual_use
              .join(r, ["site", "plant", "period_start"], "left")
              .na.fill({"r_amount": 0.0, "r_ytm": 0.0})
              .select("site", "plant", F.lit("actual").alias("category"),
                      (F.col("amount") + F.col("r_amount")).alias("amount"),
                      (F.col("ytm_amount") + F.col("r_ytm")).alias("ytm_amount"),
                      "period_start"))

    overview = reduce(DataFrame.unionByName,
                      [actual, target, remain, actual_use, info, other])
    plants = overview.select("plant").distinct()

    packaged = F.col("site").isin(*packaged_sites)
    solar_elect = overview.filter(F.col("category").isin("actual", "target"))
    et_regular = elect_total.filter(~packaged
                                    & ~F.col("site").isin(*excluded_sites))
    et_packaged = elect_total.filter(packaged)

    # per-plant ratio for regular sites
    den = et_regular.select("site", "plant", "period_start", "category",
                            F.col("amount").alias("et_amount"),
                            F.col("ytm_amount").alias("et_ytm"))
    ratio = (solar_elect.filter(~packaged)
             .join(den, ["site", "plant", "period_start", "category"], "left")
             .select("site", "plant",
                     F.concat(F.lit("solar_ratio_"),
                              F.col("category")).alias("category"),
                     _ratio_pct("amount", "et_amount").alias("amount"),
                     _ratio_pct("ytm_amount", "et_ytm").alias("ytm_amount"),
                     "period_start"))

    # packaged sites: sum both sides over plants, ratio at site level
    def site_sums(df: DataFrame) -> DataFrame:
        return (df.groupBy("site", "category", "period_start")
                  .agg(F.sum("amount").alias("amount"),
                       F.sum("ytm_amount").alias("ytm_amount")))

    solar_site = site_sums(solar_elect.filter(packaged))
    et_site = site_sums(et_packaged)
    ratio_packaged = (solar_site
                      .join(et_site.select("site", "category", "period_start",
                                           F.col("amount").alias("et_amount"),
                                           F.col("ytm_amount").alias("et_ytm")),
                            ["site", "category", "period_start"], "left")
                      .select("site", F.lit("ALL").alias("plant"),
                              F.concat(F.lit("solar_ratio_"),
                                       F.col("category")).alias("category"),
                              _ratio_pct("amount", "et_amount").alias("amount"),
                              _ratio_pct("ytm_amount", "et_ytm").alias("ytm_amount"),
                              "period_start"))
    et_site_rows = (et_site
                    .select("site", F.lit("ALL").alias("plant"),
                            F.concat(F.lit("elect_total_"),
                                     F.col("category")).alias("category"),
                            "amount", "ytm_amount", "period_start"))
    et_rows = (et_regular
               .select("site", "plant",
                       F.concat(F.lit("elect_total_"),
                                F.col("category")).alias("category"),
                       "amount", "ytm_amount", "period_start"))

    final = reduce(DataFrame.unionByName,
                   [overview, et_rows, ratio, et_site_rows, ratio_packaged])
    # only plants seen in the six-series overview survive (reference
    # :568); staging 'ALL' rollup rows keep the packaged-site output
    return final.join(F.broadcast(plants), "plant", "left_semi")
