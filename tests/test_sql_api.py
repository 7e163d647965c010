"""spark.sql API surface: the engine's queries are equally reachable
as SQL text over registered views (the reference's users write SQL;
SURVEY.md S1), and non-parquet file formats round-trip."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from esg_decarbonization_data_integration_and_data_pipline_spark.tables import register_views
from esg_decarbonization_data_integration_and_data_pipline_spark.plans.queries import REGISTRY


def test_sql_text_matches_dataframe_plan(spark, sf_dir):
    register_views(spark, sf_dir)
    sql = spark.sql("""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 4) AS sum_qty,
               count(*) AS count_order
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    """)
    df = (REGISTRY["pricing_summary"].fn(spark, sf_dir)
          .select("l_returnflag", "l_linestatus", "sum_qty", "count_order"))
    assert sorted(map(tuple, sql.collect())) == sorted(map(tuple, df.collect()))


def test_sql_window_and_rollup_text(spark, sf_dir):
    register_views(spark, sf_dir)
    out = spark.sql("""
        SELECT CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL'
                    ELSE o_orderstatus END AS o_orderstatus,
               count(*) AS n
        FROM orders GROUP BY ROLLUP (o_orderstatus)
    """).collect()
    rows = {r.o_orderstatus: r.n for r in out}
    assert rows["ALL"] == sum(v for k, v in rows.items() if k != "ALL")


def test_csv_json_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [("WZS", 1.5, "2023-01-01"), ("WKS", 2.5, "2023-02-01")],
        "site string, amount double, period_start string")
    csv_path = os.path.join(str(tmp_path), "csv")
    json_path = os.path.join(str(tmp_path), "json")
    df.write.option("header", True).csv(csv_path)
    df.write.json(json_path)
    csv_back = (spark.read.option("header", True)
                .schema("site string, amount double, period_start string")
                .csv(csv_path))
    json_back = spark.read.schema(
        "site string, amount double, period_start string").json(json_path)
    want = sorted(map(tuple, df.collect()))
    assert sorted(map(tuple, csv_back.collect())) == want
    assert sorted(map(tuple, json_back.collect())) == want
