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
    """Scan one parquet table (column pruning + predicate pushdown free).

    ``documents.text`` gets the same layout-drift insurance as
    ``events.ts``: if the driver ever ships it as a BINARY column,
    it is cast to string (Java charset semantics: malformed bytes
    become U+FFFD replacement chars -- unlike ``decode``, which
    throws under ANSI mode), so every text kernel keeps working."""
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "documents" and "text" in df.columns:
        from pyspark.sql import functions as F
        from pyspark.sql.types import BinaryType

        if isinstance(df.schema["text"].dataType, BinaryType):
            df = df.withColumn("text", F.col("text").cast("string"))
    return df


# Epoch-magnitude classification thresholds: |v| below each bound is
# interpreted as that unit. Every real epoch is unambiguous --
# seconds ~2e9, millis ~2e12, micros ~2e15, nanos ~2e18 -- so the
# decision boundaries (1e11/1e14/1e17, i.e. year ~5138 per unit) can
# never misclassify plausible data.
_EPOCH_UNITS = (
    # CAST first: int32-seconds * 1e6 overflows INT under ANSI mode
    (100_000_000_000, "CAST(ts AS BIGINT) * 1000000"),   # seconds
    (100_000_000_000_000, "CAST(ts AS BIGINT) * 1000"),  # millis
    (100_000_000_000_000_000, "CAST(ts AS BIGINT)"),     # micros
    (None, "CAST(ts AS BIGINT) div 1000"),               # nanos
)


def sniff_epoch_unit(df: DataFrame, sample_rows: int = 10_000) -> str:
    """Return the micros-conversion expr for an integer ``ts`` column
    by classifying ``max(abs(ts))`` over a bounded sample (see
    ``_EPOCH_UNITS``). Classifying on the sample MAX (not one
    arbitrary row) means a sentinel/outlier-low value like ``ts=0``
    landing first can't silently misclassify the whole dataset --
    small magnitudes are consistent with "early times" in EVERY unit,
    so only the largest magnitude is informative (which is also why
    there is no min/max same-band assertion: a legitimate epoch-0
    sentinel would trip it). The ``limit(sample_rows)`` scan reads a
    handful of row groups from one file -- metadata-cheap, and it
    only runs when the loaded dtype is integral, so the
    native-timestamp path never pays it. An all-null / empty table
    defaults to nanos (the only integer layout the driver has
    actually shipped)."""
    from pyspark.sql import functions as F

    row = (df.select("ts").where(F.col("ts").isNotNull())
             .limit(sample_rows)
             .agg(F.max(F.abs(F.col("ts").cast("bigint"))).alias("mx"))
             .first())
    if row is None or row[0] is None:
        return "ts div 1000"
    v = int(row[0])
    for bound, expr in _EPOCH_UNITS:
        if bound is None or v < bound:
            return expr
    raise AssertionError("unreachable")


def normalize_event_ts(df: DataFrame, ntz: bool = True,
                       epoch_expr: str | None = None) -> DataFrame:
    """Adapt a loaded ``ts`` column to a timestamp whatever physical
    layout the dataset was written with.

    Layouts seen or anticipated from the driver's generator:

    - parquet TIMESTAMP(NANOS): Spark can only surface it as int64
      nanoseconds (via ``nanosAsLong``) -- rebuilt at microsecond
      precision with exact integer arithmetic (``div`` -- never float
      division, which loses precision above 2^53 ns);
    - int64/int32 epochs in seconds/millis/micros: unit sniffed by
      magnitude (``sniff_epoch_unit``) unless the caller pins
      ``epoch_expr`` (streaming sniffs via a side batch read);
    - string timestamps: parsed with ``to_timestamp`` /
      ``to_timestamp_ntz`` (ISO and SQL formats);
    - native timestamp / date: stabilizing cast (current layout).

    ``ntz=True`` (batch/oracle path) yields TIMESTAMP_NTZ so results
    are timezone-independent; ``ntz=False`` yields TIMESTAMP for
    Structured Streaming watermarks (the session runs UTC, so wall
    times match the batch path either way).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import IntegerType, LongType, StringType

    dtype = df.schema["ts"].dataType
    if isinstance(dtype, (LongType, IntegerType)):
        micros = epoch_expr or sniff_epoch_unit(df)
        col = (F.expr(f"timestampadd(MICROSECOND, {micros}, "
                      "TIMESTAMP_NTZ '1970-01-01 00:00:00')") if ntz
               else F.timestamp_micros(F.expr(micros)))
    elif isinstance(dtype, StringType):
        col = (F.to_timestamp_ntz(F.col("ts")) if ntz
               else F.to_timestamp(F.col("ts")))
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
