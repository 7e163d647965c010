"""Approximate-aggregate contract: sketches must land within their
configured error bounds of the exact answers."""

from __future__ import annotations

from pyspark.sql import functions as F

from esg_decarbonization_data_integration_and_data_pipline_spark.plans.queries import REGISTRY
from esg_decarbonization_data_integration_and_data_pipline_spark.tables import table


def test_sketches_within_error_bounds(spark, sf_dir):
    approx = {r.l_returnflag: r for r in
              REGISTRY["approx_sketches"].fn(spark, sf_dir).collect()}
    li = table(spark, sf_dir, "lineitem")
    exact = {r.l_returnflag: r for r in
             (li.groupBy("l_returnflag")
                .agg(F.countDistinct("l_partkey").alias("parts"),
                     F.countDistinct("l_orderkey").alias("orders"),
                     F.expr("percentile(l_extendedprice, 0.5)").alias("median")))
             .collect()}
    for flag, e in exact.items():
        a = approx[flag]
        assert abs(a.approx_parts - e.parts) <= max(3, 0.1 * e.parts)
        assert abs(a.approx_orders - e.orders) <= max(3, 0.1 * e.orders)
        # percentile_approx with accuracy 10000 is near-exact here
        assert abs(a.approx_median_price - e.median) <= 0.05 * abs(e.median)
