"""Source connectors (SURVEY.md §2.1 S1-S5).

The reference federates Postgres + MSSQL + MySQL + REST + Excel
(reference: models/engine.py:35-37, models/engine_source.py:39-52,
jobs/source_to_raw/solar.py:93-134, jobs/shipments_etl.py:24-57).
Spark-first mapping:

- S1-S3 (databases): ``spark.read.format('jdbc')`` with either a full
  pushdown ``query`` or ``dbtable`` + Catalyst filter pushdown;
  partitioned reads (partitionColumn/bounds) for big tables.
  Federation = several jdbc frames joined/unioned in one plan.
- S4 (REST): driver-side fetch -> ``createDataFrame`` for small
  payloads; ``mapInPandas`` over a partitioned request list when the
  endpoint is sharded (the scale path).
- S5 (Excel): driver-side openpyxl/pandas parse -> createDataFrame
  (uploads are KB-sized dimension data in the reference).

The database drivers and HTTP stack aren't available in this
container, so the constructors below build the *plan/options* and
gate execution behind import/connection checks; unit tests cover the
option building and the fixture-fed paths.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def jdbc_reader(spark: SparkSession, url: str, *, query: str | None = None,
                dbtable: str | None = None, partition_column: str | None = None,
                lower_bound: int | None = None, upper_bound: int | None = None,
                num_partitions: int | None = None,
                properties: dict[str, str] | None = None):
    """Build a configured jdbc DataFrameReader (S1-S3).

    Exactly one of ``query``/``dbtable``. ``query`` ships a full
    pushdown SELECT (the reference's pd_read_sql(sql) shape);
    ``dbtable`` + partition bounds gives a parallel scan that
    Catalyst can still push filters into.
    """
    if (query is None) == (dbtable is None):
        raise ValueError("exactly one of query/dbtable is required")
    r = spark.read.format("jdbc").option("url", url)
    if query is not None:
        r = r.option("query", query)
    else:
        r = r.option("dbtable", dbtable)
        if partition_column is not None:
            if None in (lower_bound, upper_bound, num_partitions):
                raise ValueError("partitioned read needs bounds + numPartitions")
            r = (r.option("partitionColumn", partition_column)
                  .option("lowerBound", str(lower_bound))
                  .option("upperBound", str(upper_bound))
                  .option("numPartitions", str(num_partitions)))
    for k, v in (properties or {}).items():
        r = r.option(k, v)
    return r


def rest_source(spark: SparkSession, fetch: Callable[[], list[dict]],
                schema: str) -> DataFrame:
    """REST JSON source (S4): ``fetch`` returns the decoded payload
    (tests inject a fixture lambda; production wraps requests.get).
    Small payloads land on the driver then parallelize."""
    rows = fetch()
    empty = spark.createDataFrame([], schema=schema)
    if not rows:  # the reference's empty-API-response case
        return empty
    # createDataFrame(pandas, schema) maps columns POSITIONALLY --
    # reorder by schema field names so payload dict order is free
    pdf = pd.DataFrame(rows).reindex(columns=empty.schema.names)
    return spark.createDataFrame(pdf, schema=schema)


def sharded_rest_source(spark: SparkSession, shards: Sequence[str],
                        fetch_shard: Callable[[str], list[dict]],
                        schema: str) -> DataFrame:
    """Scale path for S4: one HTTP call per shard, executed on the
    executors via mapInPandas over the shard list -- bounded
    parallel fan-out instead of a driver loop."""
    shard_df = spark.createDataFrame([(s,) for s in shards], "shard string")
    out_cols = [f.name for f in spark.createDataFrame([], schema).schema]

    def run(batches):
        for pdf in batches:
            out: list[dict] = []
            for s in pdf["shard"]:
                out.extend(fetch_shard(s))
            yield (pd.DataFrame(out) if out else
                   pd.DataFrame({c: pd.Series(dtype="object") for c in out_cols}))

    return shard_df.repartition(len(shards), "shard").mapInPandas(run, schema)


def excel_source(spark: SparkSession, path_or_buf, sheet: str | int = 0,
                 usecols: str | None = None, skiprows: int = 0,
                 schema: str | None = None) -> DataFrame:
    """Excel upload source (S5): driver-side pandas parse ->
    createDataFrame. Gated behind openpyxl availability."""
    try:
        import openpyxl  # noqa: F401
    except ImportError as e:  # pragma: no cover - env without openpyxl
        raise NotImplementedError(
            "excel_source requires openpyxl; not available here") from e
    pdf = pd.read_excel(path_or_buf, sheet_name=sheet, usecols=usecols,
                        skiprows=skiprows)
    return (spark.createDataFrame(pdf, schema=schema) if schema
            else spark.createDataFrame(pdf))
