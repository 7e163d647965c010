"""MACC (marginal abatement cost curve) summary math.

Semantics (reference: macc_summary/macc_input_to_summary.py:12-283):
convert measure costs to USD via the yearly RMB->USD rate
(reference :184-187), discount to present value with
(1 + wacc)^(year - base_year) (reference :219-220), compute cost per
abated ton, and order measures cheapest-first with cumulative
abatement -- the curve itself (a YTM-style running sum over the
price rank, W1+W2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def macc_summary(tables: dict[str, DataFrame], base_year: int) -> DataFrame:
    """tables:
    measures(measure_id, site, year, cost_rmb, abatement_tons),
    fx(year, rmb_to_usd),
    wacc(wacc DOUBLE) -- 1 row.

    Output per measure: usd cost, discounted cost, cost_per_ton, the
    cheapest-first rank and the cumulative abatement at that rank.
    """
    m = tables["measures"]
    fx = tables["fx"]
    wacc = tables["wacc"]

    usd = (m.join(F.broadcast(fx), "year", "left")
            .crossJoin(F.broadcast(wacc))
            .withColumn("cost_usd", F.col("cost_rmb") * F.col("rmb_to_usd"))
            .withColumn("discount",
                        F.pow(1 + F.col("wacc"), F.col("year") - F.lit(base_year)))
            .withColumn("cost_usd_pv",
                        F.round(F.col("cost_usd") / F.col("discount"), 6))
            .withColumn("cost_per_ton",
                        F.round(F.col("cost_usd_pv")
                                / F.nullif(F.col("abatement_tons"), F.lit(0.0)),
                                6)))

    w = Window.partitionBy("year").orderBy(F.col("cost_per_ton").asc_nulls_last(),
                                           F.col("measure_id"))
    curve = (usd.withColumn("rank", F.row_number().over(w))
                .withColumn("cum_abatement",
                            F.sum("abatement_tons").over(
                                w.rowsBetween(Window.unboundedPreceding,
                                              Window.currentRow))))
    return curve.select("measure_id", "site", "year", "cost_usd_pv",
                        "cost_per_ton", "rank", "cum_abatement")
