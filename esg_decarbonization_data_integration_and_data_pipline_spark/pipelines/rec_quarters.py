"""REC quarter-calendar job (SURVEY.md F4 + §7.3 'REC quarter ladder').

Semantics (reference: jobs/staging_cal.py:794-869; quarter bucketing
jobs/renew_green_energy.py:67-104): yearly REC purchase targets are
spread across quarters (equal split), each quarter carrying its
period_start/period_end; where an ACTUAL purchase exists for a
quarter the actual replaces the target (the reference mutates
previously-written app rows month-ladder-style -- here it is an
explicit two-phase plan: build targets, then coalesce actuals over
them, no self-referential table reads).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def quarter_frame(yearly: DataFrame) -> DataFrame:
    """yearly(site, year, amount) -> one row per quarter with the
    even split and the quarter's calendar window."""
    q = yearly.select(
        "site", "year",
        F.explode(F.sequence(F.lit(1), F.lit(4))).alias("quarter"),
        (F.col("amount") / 4).alias("target_amount"))
    qstart = F.make_date(F.col("year"), (F.col("quarter") - 1) * 3 + 1, F.lit(1))
    return (q.withColumn("period_start", qstart)
             .withColumn("period_end",
                         F.last_day(F.add_months(qstart, 2))))


def rec_quarters(tables: dict[str, DataFrame]) -> DataFrame:
    """tables: rec_targets(site, year, amount),
    rec_actuals(site, year, quarter, amount).

    Output per (site, year, quarter): target split, actual if any,
    effective amount (actual wins), and the source tag."""
    targets = quarter_frame(tables["rec_targets"])
    actuals = tables["rec_actuals"].select(
        "site", "year", "quarter", F.col("amount").alias("actual_amount"))
    merged = targets.join(actuals, ["site", "year", "quarter"], "left")
    return (merged
            .withColumn("amount",
                        F.coalesce("actual_amount", "target_amount"))
            .withColumn("source",
                        F.when(F.col("actual_amount").isNotNull(), "actual")
                         .otherwise("target"))
            .select("site", "year", "quarter", "period_start", "period_end",
                    "target_amount", "actual_amount", "amount", "source"))
