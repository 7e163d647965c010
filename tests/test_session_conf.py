"""Session factory conf contract (r15): shuffle parallelism is
scale-adaptive -- derived from the session's core count with a
floor of 32 -- instead of a local-mode constant that would become
an under-partitioning ceiling on a real cluster (AQE only
coalesces DOWN from the static number).  Explicit conf and the
SPARK_GRAFT_SHUFFLE_PARTITIONS env override both win over the
derivation."""

from __future__ import annotations

from esg_decarbonization_data_integration_and_data_pipline_spark.session import (
    get_spark,
)


def test_shuffle_partitions_derive_from_parallelism(spark,
                                                    monkeypatch):
    # the shared test session passes an explicit "4": respected
    assert spark.conf.get("spark.sql.shuffle.partitions") == "4"
    # without an explicit conf, the floor-32 derivation applies to
    # the (reused) session; restore the explicit value afterwards
    s2 = get_spark("conf-probe", master="local[4]")
    try:
        par = s2.sparkContext.defaultParallelism
        assert s2.conf.get("spark.sql.shuffle.partitions") == \
            str(max(32, par))
        monkeypatch.setenv("SPARK_GRAFT_SHUFFLE_PARTITIONS", "99")
        s3 = get_spark("conf-probe-env", master="local[4]")
        assert s3.conf.get("spark.sql.shuffle.partitions") == "99"
    finally:
        s2.conf.set("spark.sql.shuffle.partitions", "4")
