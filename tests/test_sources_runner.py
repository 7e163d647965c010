"""Source connectors (fixture-fed) + DAG runner tests."""

from __future__ import annotations

import datetime as dt

import pytest

from esg_decarbonization_data_integration_and_data_pipline_spark.pipelines.run_all import JobRegistry
from esg_decarbonization_data_integration_and_data_pipline_spark.sources.connectors import (
    jdbc_reader, rest_source, sharded_rest_source,
)


def test_jdbc_reader_builds_options(spark):
    r = jdbc_reader(spark, "jdbc:postgresql://db/warehouse",
                    query="SELECT site, amount FROM raw.fem_ratio WHERE site IN ('WZS')")
    assert r is not None  # options accepted; execution needs a driver jar
    with pytest.raises(ValueError):
        jdbc_reader(spark, "jdbc:postgresql://db/w")  # neither query nor dbtable
    with pytest.raises(ValueError):
        jdbc_reader(spark, "jdbc:postgresql://db/w", dbtable="t",
                    partition_column="id")  # missing bounds


def test_rest_source_fixture_payload(spark):
    payload = [{"plant": "P1", "actual": 10.0, "target": 12.0},
               {"plant": "P2", "actual": 5.0, "target": 6.0}]
    df = rest_source(spark, lambda: payload,
                     "plant string, actual double, target double")
    assert {(r.plant, r.actual) for r in df.collect()} == {("P1", 10.0), ("P2", 5.0)}


def test_sharded_rest_source(spark):
    def fetch(shard: str):
        return [{"shard": shard, "value": float(len(shard))}]

    df = sharded_rest_source(spark, ["north", "south", "east"],
                             fetch, "shard string, value double")
    got = {r.shard: r.value for r in df.collect()}
    assert got == {"north": 5.0, "south": 5.0, "east": 4.0}


def test_job_registry_ordering_and_errors(spark):
    reg = JobRegistry()
    ran: list[str] = []

    @reg.register("ingest")
    def ingest(s, d):
        ran.append("ingest")
        return None

    @reg.register("staging", depends_on=["ingest"])
    def staging(s, d):
        ran.append("staging")
        assert "ingest" in ran
        return None

    @reg.register("broken", depends_on=["ingest"])
    def broken(s, d):
        raise RuntimeError("boom")

    results = reg.run_all(spark, dt.date(2023, 12, 1))
    assert results["ingest"] == "ok" and results["staging"] == "ok"
    assert results["broken"].startswith("error: boom")
    assert ran.index("ingest") < ran.index("staging")
