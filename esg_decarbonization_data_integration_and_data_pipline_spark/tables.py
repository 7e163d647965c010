"""Test-data catalog: load the driver's parquet tables.

The reference addresses every table as ``<schema>.<table>`` in
Postgres and reads with SQL pushdown (reference:
models/engine.py:35-37). Here a "catalog" is a directory of parquet
files; Catalyst pushes filters/projections into the parquet scan, so
``load_tables`` + ``filter`` is the moral equivalent of the
reference's hand-written WHERE clauses (SURVEY.md S1).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one parquet table (column pruning + predicate pushdown free)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def events_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load the events stream table with a proper timestamp column.

    The driver writes ``ts`` as parquet TIMESTAMP(NANOS), which Spark
    cannot map to a Catalyst type; read it as int64 nanoseconds
    (``nanosAsLong``, runtime-settable) and rebuild a TIMESTAMP_NTZ at
    microsecond precision with exact integer arithmetic (``div`` --
    never float division, which loses precision above 2^53 ns).
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = table(spark, sf_dir, "events")
    return df.withColumn(
        "ts",
        F.expr("timestampadd(MICROSECOND, ts div 1000, "
               "TIMESTAMP_NTZ '1970-01-01 00:00:00')"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` works too.
    ``events`` goes through its nanos-timestamp conversion."""
    for name in TABLE_NAMES:
        df = (events_table(spark, sf_dir) if name == "events"
              else table(spark, sf_dir, name))
        df.createOrReplaceTempView(name)
