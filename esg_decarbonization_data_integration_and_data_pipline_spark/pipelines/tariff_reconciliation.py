"""staging->app tariff reconciliation: the as-of + interval join job.

Semantics (reference: jobs/staging_to_app.py:45-140): each electric
bill line is priced by (1) picking, per area, the tariff guideline
with the latest guideline_date <= the billing period (as-of join J7,
reference :104-116), then (2) matching the rate row for the bill's
rate category where the billing period falls inside the guideline's
summer window -- or the non-summer complement (interval join J6,
reference :129-140).

Spark shape: both dims are small -> broadcast; the as-of pick is a
window top-1; the summer test is a join-condition band predicate.
No driver loops, no per-month recomputation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from esg_decarbonization_data_integration_and_data_pipline_spark.operators.joins import asof_join


def price_bills(tables: dict[str, DataFrame]) -> DataFrame:
    """tables:
    bills(site, meter_code, category2, amount, period_start, area),
    bill_base(base_id, area, guideline_date, summer_start_month,
    summer_end_month),
    bill_meter(base_id, category STRING (=category2), price,
    is_summer BOOLEAN).

    Output: bill lines + (base_id, guideline_date, price, is_summer,
    cost = amount * price).
    """
    bills = tables["bills"]
    base = tables["bill_base"]
    meter = tables["bill_meter"]

    # (1) as-of: latest guideline per area at the billing period
    based = asof_join(
        bills, base, ["area"], "period_start", "guideline_date",
        tiebreak=["base_id"])

    # (2) summer-band rate match: the bill month inside the summer
    # window takes the is_summer rate, otherwise the complement
    in_summer = F.month("period_start").between(
        F.col("summer_start_month"), F.col("summer_end_month"))
    priced = based.join(
        F.broadcast(meter),
        (based["base_id"] == meter["base_id"])
        & (based["category2"] == meter["category"])
        & (meter["is_summer"] == in_summer),
        "left").drop(meter["base_id"]).drop("category")

    return (priced
            .withColumn("cost", F.round(F.col("amount") * F.col("price"), 6))
            .select("site", "meter_code", "category2", "area",
                    "period_start", "amount", "base_id", "guideline_date",
                    "is_summer", "price", "cost"))
