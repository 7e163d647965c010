"""raw->staging electric-bill split: the four contract tables.

Semantics (reference: jobs/raw_to_staging.py:133-205,921 prefix): the
raw electric bill arrives as meter-level rows keyed (meter_code,
category1, category2, year, month). The shared prefix recodes rate
categories, builds period_start from (year, month), enriches with
the meter dimension (site/plant/provider), and computes the YTM
cumulative amounts; the job then SPLITS by contract family
(category1) into green_elect_contract / green_elect_price /
green_elect_vol / grey_elect, each written with the date-range
replace policy.

Spark shape: ONE pass computes the shared prefix (recode + calendar
+ broadcast join + YTM window); the four outputs are filters over it
-- Catalyst re-reads the cached prefix or recomputes the narrow
chain, never four bespoke pipelines like the reference.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F

from esg_decarbonization_data_integration_and_data_pipline_spark.functions.calendar import month_start
from esg_decarbonization_data_integration_and_data_pipline_spark.operators.windows import ytm_cumsum

# rate-category recode (reference value maps jobs/raw_to_staging.py:131,136)
CATEGORY2_RECODE = {
    "半尖峰(夏月)": "半尖峰",
    "半尖峰(非夏月)": "半尖峰",
    "週六半尖峰(夏月)": "週六半尖峰",
    "週六半尖峰(非夏月)": "週六半尖峰",
}

# contract family (category1) -> output table
FAMILY_TABLES = {
    "綠色能源": "green_elect_contract",
    "契約": "green_elect_price",
    "轉供": "green_elect_vol",
    "計費": "grey_elect",
}


def bill_prefix(tables: dict[str, DataFrame]) -> DataFrame:
    """The shared prefix: recode + period build + meter enrich + YTM."""
    bill = tables["electric_bill"]
    meter = tables["meter_dim"]  # (meter_code, site, plant, provider_name)

    recode = reduce(
        lambda acc, kv: acc.when(F.col("category2") == kv[0], F.lit(kv[1])),
        CATEGORY2_RECODE.items(), F.when(F.lit(False), F.lit(None)))
    prefixed = (bill
                .withColumn("category2", recode.otherwise(F.col("category2")))
                .withColumn("period_start",
                            month_start(F.col("year"), F.col("month")))
                .join(F.broadcast(meter), "meter_code", "left"))
    monthly = (prefixed.groupBy("site", "plant", "meter_code", "provider_name",
                                "category1", "category2", "year", "period_start")
                        .agg(F.sum("amount").alias("amount")))
    return ytm_cumsum(
        monthly,
        ["site", "plant", "meter_code", "provider_name",
         "category1", "category2", "year"],
        "period_start", "amount")


def split_bill_tables(tables: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """Returns the four staging frames keyed by output table name.
    The shared prefix is cached so writing all four outputs runs the
    recode/join/YTM chain once, not four times."""
    prefix = bill_prefix(tables).cache()
    cols = ["site", "plant", "meter_code", "provider_name", "category1",
            "category2", "amount", "ytm_amount", "period_start"]
    return {
        out: prefix.filter(F.col("category1") == fam).select(*cols)
        for fam, out in FAMILY_TABLES.items()
    }
