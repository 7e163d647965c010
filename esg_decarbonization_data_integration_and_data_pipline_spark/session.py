"""SparkSession factory with scale-oriented defaults.

The reference runs single-core pandas in one Flask container
(reference: Dockerfile:1-26, models/engine.py:35-58); our engine is a
SparkSession tuned for a multi-executor cluster. Tests and the local
bench run on ``local[N]`` but every setting below is chosen to also
hold on a 1000-executor cluster reading 100 TB:

- AQE on (runtime coalesce + skew-join splitting) so static
  ``shuffle.partitions`` only needs to be an upper bound;
- broadcast threshold raised: dimension tables (plant_mapping-like,
  region/nation/part) are KBs-to-MBs and must never sort-merge;
- Arrow enabled so the few Pandas-UDF operators batch efficiently;
- session timezone pinned to UTC for deterministic calendar math.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONF: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.compression.codec": "zstd",
    # dynamic partition overwrite backs the idempotent
    # delete-slice-then-append write pattern (see io/writers.py)
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
}


def get_spark(app_name: str = "decarb-spark", master: str | None = None,
              conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` when no
    cluster manager is configured, mirroring how the bench harness
    runs; on a real cluster the master comes from spark-submit.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_MASTER" not in os.environ:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
    merged = dict(DEFAULT_CONF)
    if conf:
        merged.update(conf)
    for k, v in merged.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # shuffle parallelism is SCALE-ADAPTIVE, not a constant (r15,
    # guide section 2.2): AQE only coalesces DOWN from the static
    # number, so a local-mode constant (the old "32") becomes an
    # under-partitioning ceiling on a real cluster.  The default
    # upper bound derives from the session's actual core count
    # (identical to the old value on local[32], so bench numbers
    # stay comparable; ~one wave per core elsewhere), floored at 32
    # so tiny local sessions keep enough split granularity for AQE
    # to work with.  Production jobs that know their shuffle BYTES
    # should size partitions at 100-1000 MB each instead, via the
    # explicit conf / SPARK_GRAFT_SHUFFLE_PARTITIONS override --
    # this is a parallelism bound, not a data-size tune.  Runtime-
    # mutable SQL conf, so it also applies when getOrCreate reuses
    # an existing session.
    explicit = conf and "spark.sql.shuffle.partitions" in conf
    env = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")
    if env:
        spark.conf.set("spark.sql.shuffle.partitions", env)
    elif not explicit:
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            str(max(32, spark.sparkContext.defaultParallelism)))
    return spark
