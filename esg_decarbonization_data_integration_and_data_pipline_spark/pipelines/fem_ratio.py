"""source->raw ratio job: the reference's MVP pipeline re-expressed.

Semantics (reference: jobs/source_to_raw/fem_ratio.py:8-59, the
reference's own first unit test tests/jobs_source_to_raw_test.py:21-24):
scan daily power readings for the processing month -> restrict to the
consumption measure -> enrich with the plant dimension -> aggregate
to plant-month -> per-month ratio of each plant against the month
total (the transform('sum') window, SURVEY A7) -> stamp period_start
/ category / last_update_time -> idempotent keyed write.

Spark shape: filters push into the parquet/JDBC scan; the plant dim
broadcasts; one shuffle for the plant-month aggregate; the month
total is a window over the aggregate (no second scan).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, Window, functions as F

from esg_decarbonization_data_integration_and_data_pipline_spark.functions.calendar import (
    processing_window,
)

CONSUME_TYPE = "用電量"


def fem_ratio(tables: dict[str, DataFrame], run_date: dt.date,
              sites: list[str] | None = None) -> DataFrame:
    """tables: fem_dailypower(site, plant_code, datadate, power,
    consumetype), plant_mapping(site, plant_name, plant_code)."""
    start, end = processing_window(run_date)
    daily = tables["fem_dailypower"]
    mapping = tables["plant_mapping"]

    scoped = daily.filter(
        (F.col("consumetype") == CONSUME_TYPE)
        & F.col("datadate").between(F.lit(start), F.lit(end)))
    if sites:
        scoped = scoped.filter(F.col("site").isin(sites))

    # DISTINCT mirrors the reference's `SELECT DISTINCT ... FROM
    # plant_mapping WHERE site IN (<site>)`: the mapping is scoped to
    # the SAME sites as the power rows BEFORE deduplication (a
    # plant_code mapped to a different name under an out-of-scope site
    # must not fan out the join), and the same (code, name) pair
    # listed under several in-scope sites must not multiply either
    # (jobs/source_to_raw/fem_ratio.py:13-17)
    scoped_mapping = (mapping.filter(F.col("site").isin(sites))
                      if sites else mapping)
    dim = scoped_mapping.select("plant_code", "plant_name").dropDuplicates()
    enriched = (scoped.join(F.broadcast(dim), "plant_code", "left")
                      .na.drop(subset=["plant_name"]))

    # the output plant label is the plant NAME, not the code: the
    # reference's plant_map selects plant_name AS "plant" and groups
    # on it (jobs/source_to_raw/fem_ratio.py:13-17), so two codes
    # mapping to one name sum together -- pinned by the 1-row fixture
    # parity test (tests/test_reference_fixtures.py)
    monthly = (enriched.groupBy(F.col("plant_name").alias("plant"))
                       .agg(F.sum("power").alias("amount")))
    total_w = Window.partitionBy()  # month-scoped run => one global total
    out = (monthly
           .withColumn("ratio",
                       F.col("amount")
                       / F.nullif(F.sum("amount").over(total_w), F.lit(0.0)))
           .withColumn("period_start", F.lit(start))
           .withColumn("category", F.lit("plant"))
           .withColumn("last_update_time",
                       F.lit(dt.datetime.combine(run_date, dt.time()))))
    return out.select("amount", "plant", "ratio", "period_start",
                      "category", "last_update_time")
