"""REST power-generation feed -> raw.solar (SURVEY.md S4).

Semantics (reference: jobs/source_to_raw/solar.py:93-134): the
generation API returns per-plant actual and target series for the
processing month; the job reshapes them into long category rows
('actual'/'target'), stamps period_start and the source type, and
lands them idempotently. The HTTP fetch is injected (tests pass a
fixture lambda; production wraps requests.get) via
sources.connectors.rest_source; the empty-payload case the
reference's own unit test exercises yields an empty frame with the
full schema.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from esg_decarbonization_data_integration_and_data_pipline_spark.functions.calendar import (
    processing_window,
)
from esg_decarbonization_data_integration_and_data_pipline_spark.operators.reshape import melt
from esg_decarbonization_data_integration_and_data_pipline_spark.sources.connectors import rest_source

PAYLOAD_SCHEMA = "plant string, actual double, target double"


def solar_from_rest(spark: SparkSession, fetch: Callable[[], list[dict]],
                    run_date: dt.date) -> DataFrame:
    """fetch() -> [{'plant': ..., 'actual': ..., 'target': ...}, ...]
    Output: (plant, category, amount, period_start, type)."""
    start, _ = processing_window(run_date)
    wide = rest_source(spark, fetch, PAYLOAD_SCHEMA)
    long = melt(wide, ["plant"], ["actual", "target"],
                var_name="category", value_name="amount")
    return (long
            .withColumn("period_start", F.lit(start))
            .withColumn("type", F.lit("solar_api"))
            .select("plant", "category", "amount", "period_start", "type"))
