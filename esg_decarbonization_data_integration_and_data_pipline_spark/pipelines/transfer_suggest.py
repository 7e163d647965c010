"""Next-year green-power transfer suggestion (inferred job).

The reference's ``main.py:2-3`` imports
``elec_transfer.next_year_green_power_transfer_suggest`` and calls it
as the second-to-last nightly step (``main.py:110``), but the
``elec_transfer`` module is absent from the public snapshot; SURVEY.md
scopes it as "an additional batch pipeline of the same shape as the
other jobs", with semantics inferred from the name and its DAG
position (after the green-energy demand overview, before the MACC
summary):

1. per-site NEXT-YEAR green-power shortfall: latest actual
   consumption x next year's renewable-target rate, minus green power
   already secured (solar + contracted green electricity) -- the same
   gap formula the demand overview uses
   (jobs/renew_green_energy.py:21-57);
2. fill each site's shortfall from its transferable contract offers
   cheapest-first -- the reference's greedy price-rank allocation
   (Model/RE_purpose_optimizer.py:190-223), per site instead of per
   year.

Spark shape: the gap is broadcast joins + ``greatest``; the
allocation reuses ``greedy_allocate`` grouped on site (shuffle once
on site, tiny in-memory greedy loop per group via Arrow).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from esg_decarbonization_data_integration_and_data_pipline_spark.pipelines.allocator import greedy_allocate


def transfer_gaps(tables: dict[str, DataFrame], next_year: int) -> DataFrame:
    """Per-site next-year green-power shortfall.

    tables:
    consumption(site, year, amount) -- historical actuals,
    ratio_path(year, renewable_ratio) -- target share per year,
    secured(site, green_kwh)        -- already-secured green power.

    Output: (site, base_amount, target_rate, target_kwh, secured_kwh,
    target_amount) where target_amount = max(0, target_kwh -
    secured_kwh) feeds the allocator as the demand.
    """
    latest = (tables["consumption"].groupBy("site")
              .agg(F.expr("max_by(amount, year)").alias("base_amount")))
    # a global aggregate yields EXACTLY one rate row: a missing
    # next_year entry becomes rate 0 (sites stay visible with a zero
    # target instead of the whole job silently emitting nothing),
    # and duplicate path rows cannot fan out the cross join
    rate = (tables["ratio_path"]
            .filter(F.col("year") == next_year)
            .agg(F.max("renewable_ratio").alias("target_rate")))
    secured = (tables["secured"].groupBy("site")
               .agg(F.sum("green_kwh").alias("secured_kwh")))
    return (latest.crossJoin(F.broadcast(rate))
            .na.fill({"target_rate": 0.0})
            .join(secured, "site", "left")
            .na.fill({"secured_kwh": 0.0})
            .withColumn("target_kwh",
                        F.col("base_amount") * F.col("target_rate"))
            .withColumn("target_amount",
                        F.greatest(F.col("target_kwh")
                                   - F.col("secured_kwh"), F.lit(0.0))))


def next_year_transfer_suggest(tables: dict[str, DataFrame],
                               next_year: int) -> DataFrame:
    """Suggested per-(site, contract) transfer volumes for next year.

    tables: as ``transfer_gaps`` plus
    offers(site, source_id, price, available) -- transferable
    green-power contract offers quoted per site.

    Output: (site, source_id, price, available, rank, allocated,
    cum_allocated, target_amount, unfilled) -- cheapest-first greedy
    fill per site; ``unfilled`` > 0 flags sites whose offer pool
    cannot cover the shortfall. A site with a positive shortfall but
    NO offers at all still surfaces, as one row with a null
    source_id and unfilled = target_amount -- the fully unfillable
    gap is the one planners must see.
    """
    gaps = transfer_gaps(tables, next_year)
    targets = gaps.select("site", "target_amount")
    alloc = greedy_allocate(tables["offers"], targets,
                            key="site", key_type="string")
    return (targets.join(alloc.drop("target_amount"), "site", "left")
                   .withColumn("unfilled",
                               F.greatest(F.col("target_amount")
                                          - F.coalesce("cum_allocated",
                                                       F.lit(0.0)),
                                          F.lit(0.0))))
