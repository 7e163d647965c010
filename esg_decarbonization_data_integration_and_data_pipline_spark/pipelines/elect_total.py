"""staging.elect_total: plant-level target/actual electricity series.

Semantics (reference: jobs/raw_to_staging.py:670-845 elect_total):
site-level monthly amounts from the latest validated target table are
DISAGGREGATED to plant level -- sites with a ratio table (WKS via
raw.fem_ratio, WZS via raw.solar_ratio) multiply amount x ratio per
(period_start, plant); every other site passes through with
plant = site. The target and actual slices are labeled, unioned, and
YTM-cumsummed per (year, plant, category) before the year-window
replace.

Spark shape: each ratio slice is a broadcast join on period_start;
the pass-through is a projection; one union, one YTM window, one
keyed write. The reference's per-site frame juggling is N small
plans unioned into one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from esg_decarbonization_data_integration_and_data_pipline_spark.operators.windows import ytm_cumsum


def disaggregate_site_to_plant(site_rows: DataFrame,
                               ratio_tables: dict[str, DataFrame]
                               ) -> DataFrame:
    """site_rows(site, period_start, amount) -> (site, plant,
    period_start, amount): ratio-split for sites in ``ratio_tables``
    (each (plant, period_start, ratio)), identity pass-through for
    the rest (reference :711-752)."""
    parts = []
    for site, ratios in ratio_tables.items():
        r = ratios.select("plant", "period_start", "ratio")
        # a period missing from the ratio table falls back to the
        # identity pass-through (plant = site, full amount) instead
        # of emitting a (plant NULL, amount NULL) row that silently
        # destroys the period's electricity -- mass is conserved
        # either way (pinned by the conservation property test; the
        # reference would carry the NaN row, jobs/raw_to_staging.py
        # :718-724)
        parts.append(
            site_rows.filter(F.col("site") == site)
                     .join(F.broadcast(r), "period_start", "left")
                     .select("site",
                             F.coalesce("plant", "site").alias("plant"),
                             "period_start",
                             (F.col("amount")
                              * F.coalesce("ratio", F.lit(1.0)))
                             .alias("amount")))
    other = (site_rows.filter(~F.col("site").isin(list(ratio_tables)))
             .select("site", F.col("site").alias("plant"),
                     "period_start", "amount"))
    out = other
    for p in parts:
        out = out.unionByName(p)
    return out


def elect_total(targets: DataFrame, actuals: DataFrame,
                ratio_tables: dict[str, DataFrame]) -> DataFrame:
    """Assemble the staging.elect_total content (reference :670-845):
    both slices disaggregated, labeled target/actual, unioned, then
    YTM per (year, plant, category).

    targets / actuals: (site, period_start, amount) -- the latest
    validated version's predict/actual rows, site != 'All'.
    """
    t = (disaggregate_site_to_plant(targets, ratio_tables)
         .withColumn("category", F.lit("target")))
    a = (disaggregate_site_to_plant(actuals, ratio_tables)
         .withColumn("category", F.lit("actual")))
    u = (t.unionByName(a)
          .withColumn("year", F.year("period_start")))
    out = ytm_cumsum(u, ["year", "plant", "category"], "period_start",
                     "amount")
    return out.select("site", "plant", "category", "amount",
                      "ytm_amount", "period_start")
