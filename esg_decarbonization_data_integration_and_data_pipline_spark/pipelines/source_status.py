"""Source-confirmation status job (app.source_decarb_confirm).

Semantics (reference: jobs/fix_data.py:235-320 source_status):

- a year-to-processing-month window with its own Jan/Feb wrap rules
  (:237-265): January runs grade last year's months 1..12; February
  grades the new year's month 1 with the carry-forward seed taken
  from last December; otherwise months 1..(run month - 1) with the
  seed from two months back;
- on the first day of a month the previous period's confirm rows are
  carried forward as the new month's seed, with type cleared
  (:267-282);
- data presence is derived from DISTINCT (site, period, type) rows of
  the landed electricity table (item = 實際用電) unioned with the
  renewable table (item = category2 recoded 光伏/綠電/綠證 ->
  自建太陽能/直購綠電/購買綠證), type != '' only (:285-296);
- presence joins the site-category mapping, splits period into
  year/month, and left-joins ONTO the existing confirm rows so every
  confirm row keeps its checkbox while gaining the landed-source
  type, recoded wzs_esgi -> ESGI, CSR -> ESG Database (:298-316);
- the whole (year, months 1..month_end) slice is then replaced.

Spark shape: two distinct-projections + a union + two broadcast
joins; the reference's day-1 seed copy is a separate pure function
the orchestrator calls before the status merge (same sequencing).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, functions as F

from esg_decarbonization_data_integration_and_data_pipline_spark.functions.recode import recode

ITEM_ACTUAL = "實際用電"
ITEM_RECODE = {"光伏": "自建太陽能", "綠電": "直購綠電", "綠證": "購買綠證"}
TYPE_RECODE = {"wzs_esgi": "ESGI", "CSR": "ESG Database"}


def status_window(run_date: dt.date) -> dict[str, object]:
    """The reference's three-branch calendar (:237-265): keys
    year/month_start/month_end grade the current window; year_last/
    month_last locate the carry-forward seed period."""
    y, m = run_date.year, run_date.month
    if m == 1:
        win = dict(year=y - 1, month_start=1, month_end=12,
                   year_last=y - 1, month_last=11)
    elif m == 2:
        win = dict(year=y, month_start=1, month_end=1,
                   year_last=y - 1, month_last=12)
    else:
        win = dict(year=y, month_start=1, month_end=m - 1,
                   year_last=y, month_last=m - 2)
    win["period_year_start"] = dt.date(win["year"], 1, 1)
    win["period_year_end"] = dt.date(win["year"], win["month_end"], 1)
    return win


def seed_current_month(confirm: DataFrame, run_date: dt.date) -> DataFrame:
    """Day-1 carry-forward (:267-282): previous period's rows
    relabeled to the new (year, month_end) with type cleared. The
    caller appends this before running source_status, exactly like
    the reference's delete+insert preamble."""
    w = status_window(run_date)
    return (confirm
            .filter((F.col("year") == w["year_last"])
                    & (F.col("month") == w["month_last"]))
            .select("site_category", "site", "item",
                    F.lit(w["year"]).alias("year"),
                    F.lit(w["month_end"]).alias("month"),
                    "confirm", F.lit("").alias("type")))





def source_status(tables: dict[str, DataFrame],
                  run_date: dt.date) -> DataFrame:
    """tables:
    electricity(site, period_start, type)   -- raw landed totals,
    renewable(site, category2, period_start, type),
    plant_mapping(site_category, site),
    confirm(site_category, site, item, year, month, confirm).

    Returns the replacement frame for the (year, 1..month_end) slice:
    every existing confirm row plus the landed-source ``type``.
    """
    w = status_window(run_date)
    in_window = F.col("period_start").between(w["period_year_start"],
                                              w["period_year_end"])
    landed = F.col("type") != ""

    elec = (tables["electricity"]
            .filter(in_window & landed)
            .select("site", "period_start", "type")
            .distinct()
            .withColumn("item", F.lit(ITEM_ACTUAL)))
    renew = (tables["renewable"]
             .filter(in_window & landed)
             .select("site",
                     recode(F.col("category2"), ITEM_RECODE).alias("item"),
                     "period_start", "type")
             .distinct())
    presence = elec.unionByName(renew)

    site_map = tables["plant_mapping"].select("site_category", "site").distinct()
    target = (presence
              .join(F.broadcast(site_map), "site", "left")
              .select("site", "type", "item", "site_category",
                      F.year("period_start").alias("year"),
                      F.month("period_start").alias("month")))

    confirm = (tables["confirm"]
               .filter((F.col("year") == w["year"])
                       & F.col("month").between(w["month_start"],
                                                w["month_end"])))
    return (confirm
            .join(target, ["site", "item", "site_category", "year", "month"],
                  "left")
            .withColumn("type", recode(F.col("type"), TYPE_RECODE))
            .select("site_category", "site", "item", "year", "month",
                    "confirm", "type"))
