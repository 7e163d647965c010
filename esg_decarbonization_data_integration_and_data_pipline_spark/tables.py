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


def normalize_event_ts(df: DataFrame, ntz: bool = True) -> DataFrame:
    """Adapt a loaded ``ts`` column to a timestamp whatever physical
    layout the dataset was written with.

    Two layouts exist in the wild: parquet TIMESTAMP(NANOS), which
    Spark can only surface as int64 nanoseconds (via ``nanosAsLong``),
    and plain ``timestamp[us]``, which loads natively. Branch on the
    LOADED dtype, not an assumption about the writer: int64 nanos are
    rebuilt at microsecond precision with exact integer arithmetic
    (``div`` -- never float division, which loses precision above
    2^53 ns); native timestamps pass through with a stabilizing cast.

    ``ntz=True`` (batch/oracle path) yields TIMESTAMP_NTZ so results
    are timezone-independent; ``ntz=False`` yields TIMESTAMP for
    Structured Streaming watermarks (the session runs UTC, so wall
    times match the batch path either way).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    if isinstance(df.schema["ts"].dataType, LongType):
        col = (F.expr("timestampadd(MICROSECOND, ts div 1000, "
                      "TIMESTAMP_NTZ '1970-01-01 00:00:00')") if ntz
               else F.timestamp_micros(F.expr("ts div 1000")))
    else:
        col = F.col("ts").cast("timestamp_ntz" if ntz else "timestamp")
    return df.withColumn("ts", col)


def events_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load the events stream table with a proper TIMESTAMP_NTZ ``ts``,
    adapting to either physical layout (see ``normalize_event_ts``)."""
    # harmless when the data is already timestamp[us]; required to load
    # TIMESTAMP(NANOS) datasets at all
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return normalize_event_ts(table(spark, sf_dir, "events"), ntz=True)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` works too.
    ``events`` goes through its nanos-timestamp conversion."""
    for name in TABLE_NAMES:
        df = (events_table(spark, sf_dir) if name == "events"
              else table(spark, sf_dir, name))
        df.createOrReplaceTempView(name)
