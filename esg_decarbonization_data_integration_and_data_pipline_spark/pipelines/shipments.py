"""Three-year shipment-plan Excel ETL (app.decarb_est_shipments).

Semantics (reference: jobs/shipments_etl.py:24-124 upload_shipment):

- the upload workbook holds FOUR side-by-side wide blocks on one
  sheet (columns A:M, O:AA, AC:AO, AQ:BC), each a site x jan..dec
  grid for base year + 0..3 (:62-72);
- header cells carry the plan metadata: B2 = version (also the base
  year), B1 = the person in charge (:50-56);
- each block is melted to (site, month, amount) (:24-31), the blocks
  are unioned with their year attached, the grand-total row (site =
  '總計') is dropped and missing amounts become 0 (:74-77);
- version/pic are stamped on every row and the
  (year, month, site, version) slice is delete-then-appended
  (:95-121) -- our ``replace_keys`` writer.

Spark shape: the melt is the no-shuffle ``unpivot`` operator; block
parsing happens driver-side on the tiny workbook (like every dim
upload) and lands as a DataFrame immediately. The xlsx byte-parsing
path reuses ``excel_source`` and is gated on openpyxl; the block
assembly is pure DataFrame code and testable without it.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from esg_decarbonization_data_integration_and_data_pipline_spark.operators.reshape import melt

BLOCK_COLS = ["A:M", "O:AA", "AC:AO", "AQ:BC"]
TOTAL_ROW = "總計"
MONTH_COLS = [str(m) for m in range(1, 13)]


def melt_shipment_block(block: DataFrame, year: int) -> DataFrame:
    """One wide site x month block -> long rows for ``year``. The
    block must carry columns site, "1".."12" (the reference renames
    positional Excel columns to these, :28)."""
    long = melt(block, ["site"], MONTH_COLS, "month", "amount")
    return (long
            .withColumn("month", F.col("month").cast("int"))
            .withColumn("year", F.lit(year)))


def assemble_shipments(blocks: list[DataFrame], version: int,
                       pic: str) -> DataFrame:
    """Union the per-offset blocks (year = version + offset), drop
    the grand-total row, zero-fill missing amounts, stamp metadata."""
    melted = [melt_shipment_block(b, version + i)
              for i, b in enumerate(blocks)]
    df = reduce(DataFrame.unionByName, melted)
    return (df
            .filter(F.col("site") != TOTAL_ROW)
            .na.fill({"amount": 0.0})
            .withColumn("version", F.lit(version))
            .withColumn("pic", F.lit(pic))
            .select("site", "month", "amount", "year", "version", "pic"))


def shipment_growth_ladder(plan: DataFrame,
                           unit: float = 1000.0) -> DataFrame:
    """Year-over-year shipment growth rates from the 3-year plan
    (reference: Model/Factory_elect_simulator_update.py:495-516
    ``variable_3y_forecast_generator`` GR block).

    plan(site, year, month, amount) -> (site, year, gr) where gr is
    the growth of year over year-1 site totals (amounts are plan
    thousands, scaled by ``unit``). Reference quirks preserved:

    - a degenerate base (total ~ 0) explodes the ratio; GR > 1000 is
      clamped to 0.5 (reference :505);
    - sites with NO consecutive-year pair get half the full-span
      rate -- (last - first) / first / 2 -- stamped on their last TWO
      plan years (reference :507-515, which back-fills the previous
      year with the same rate).

    DELIBERATE divergence from the reference's na-path: the reference
    only reaches its fallback for sites absent from ALL
    consecutive-pair merges -- a gap-year site ends up with NaN GR
    rows keyed to a NaN year, and a single-year site gets NaN from
    the global-min-year merge. Emitting NaN-keyed rows is a bug, not
    a semantic; this version gives those sites the half-span rate
    (or 0.0) on their last two plan years instead.

    One lag window per site (tiny dimension) + one anti-join for the
    fallback sites; no collect.
    """
    yearly = (plan.groupBy("site", "year")
                  .agg((F.sum("amount") * unit).alias("total")))
    w = Window.partitionBy("site").orderBy("year")
    lagged = (yearly.withColumn("prev_total", F.lag("total").over(w))
                    .withColumn("prev_year", F.lag("year").over(w)))
    # a zero base year is the pandas inf -> clamp path: growing from 0
    # clamps to 0.5 (like the reference's GR > 1000 rule, which inf
    # trips); a 0 -> 0 pair is flat growth, not NULL
    raw_gr = (F.col("total") - F.col("prev_total")) / F.col("prev_total")
    zero_base = F.when(F.col("total") > 0, F.lit(0.5)).otherwise(F.lit(0.0))
    gr = (lagged.filter(F.col("prev_year") == F.col("year") - 1)
                .withColumn("gr", F.when(F.col("prev_total") == 0, zero_base)
                             .when(raw_gr > 1000, 0.5)
                             .otherwise(raw_gr))
                .select("site", "year", "gr"))
    bounds = yearly.groupBy("site").agg(
        F.expr("min_by(total, year)").alias("first_total"),
        F.expr("max_by(total, year)").alias("last_total"),
        F.max("year").alias("last_year"))
    span_gr = ((F.col("last_total") - F.col("first_total"))
               / F.col("first_total") / 2)
    fallback = (bounds.join(gr.select("site").distinct(), ["site"],
                            "left_anti")
                .withColumn("gr", F.when(
                    F.col("first_total") == 0,
                    F.when(F.col("last_total") > 0, F.lit(0.5))
                     .otherwise(F.lit(0.0))).otherwise(span_gr))
                .select("site",
                        F.explode(F.array(F.col("last_year"),
                                          F.col("last_year") - 1)).alias("year"),
                        "gr"))
    return gr.unionByName(fallback)


def plant_month_rates(budget: DataFrame,
                      value_col: str = "shipment_qty") -> DataFrame:
    """Plant-month share of the site's budget total, from the
    budget's LATEST year only (reference:
    Model/Factory_elect_simulator_update.py:449,474-477 -- the MOH
    budget is filtered to its max year before the site-year sum, so
    ONE rate set exists per (site, plant, month) and the site-only
    spread join cannot fan a plan year out across budget years)."""
    latest = budget.join(
        F.broadcast(budget.groupBy("site")
                          .agg(F.max("year").alias("year"))),
        ["site", "year"])
    tot = latest.groupBy("site", "year").agg(F.sum(value_col).alias("__tot"))
    return (latest.join(tot, ["site", "year"])
                  .withColumn("rate", F.col(value_col) / F.col("__tot"))
                  .select("site", "plant", "month", "rate"))


def spread_yearly_shipments(yearly: DataFrame, rates: DataFrame,
                            overrides: DataFrame | None = None) -> DataFrame:
    """Spread site-year shipment totals onto (plant, month) by the
    budget month rates, then overlay explicit plant-month forecasts
    (reference: Model/Factory_elect_simulator_update.py:519-532).

    yearly(site, year, total); rates(site, plant, month, rate);
    overrides(plant, year, month, amount) or None.

    Sites absent from the budget keep their site total as a single
    pseudo-plant row with rate 1 (reference :467-469 defaults missing
    rates to 1 and missing plant names to the site). Rates are a tiny
    dimension -- broadcast; the overlay is a left join + coalesce
    (reference's isna/np.where idiom).
    """
    out = (yearly.join(F.broadcast(rates), ["site"], "left")
                 .withColumn("rate", F.coalesce("rate", F.lit(1.0)))
                 .withColumn("plant", F.coalesce("plant", "site"))
                 .withColumn("month",
                             F.coalesce("month", F.lit(1)).cast("int"))
                 .withColumn("amount", F.col("total") * F.col("rate"))
                 .select("site", "plant", "year", "month", "amount"))
    if overrides is not None:
        ov = overrides.select("plant", "year", "month",
                              F.col("amount").alias("__override"))
        out = (out.join(F.broadcast(ov), ["plant", "year", "month"], "left")
                  .withColumn("amount", F.coalesce("__override", "amount"))
                  .drop("__override"))
    return out


def shipment_3y_forecast(plan: DataFrame, budget: DataFrame,
                         overrides: DataFrame | None = None,
                         unit: float = 1000.0) -> tuple[DataFrame, DataFrame]:
    """The full 3-year shipment forecast stage: (spread plant-month
    forecast, growth-rate ladder) -- the two outputs the reference's
    ``variable_3y_forecast_generator`` feeds into the electricity
    simulator (reference: Model/Factory_elect_simulator_update.py:
    424-541)."""
    yearly = (plan.groupBy("site", "year")
                  .agg((F.sum("amount") * unit).alias("total")))
    spread = spread_yearly_shipments(
        yearly, plant_month_rates(budget), overrides)
    return spread, shipment_growth_ladder(plan, unit)


def upload_shipments(spark: SparkSession, xlsx_path: str,
                     sheet: str = "三年計畫_出貨量") -> DataFrame:
    """Full reference path: parse header cells + four blocks from the
    workbook. Requires openpyxl (loud gate, like ``excel_source``)."""
    try:
        import openpyxl
    except ImportError as e:  # pragma: no cover - env without openpyxl
        raise NotImplementedError(
            "upload_shipments requires openpyxl; not available here") from e
    import pandas as pd

    wb = openpyxl.load_workbook(xlsx_path)
    ws = wb.active
    version = int(ws.cell(row=2, column=2).value)
    pic = str(ws.cell(row=1, column=2).value)
    wb.close()

    blocks = []
    for usecols in BLOCK_COLS:
        pdf = pd.read_excel(xlsx_path, sheet_name=sheet, usecols=usecols,
                            skiprows=4, header=None)
        pdf.columns = ["site", *MONTH_COLS]
        pdf["site"] = pdf["site"].astype(str)
        pdf[MONTH_COLS] = pdf[MONTH_COLS].astype(float)
        blocks.append(spark.createDataFrame(pdf))
    return assemble_shipments(blocks, version, pic)
