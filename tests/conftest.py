from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from esg_decarbonization_data_integration_and_data_pipline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("decarb-tests", master="local[4]",
                  conf={"spark.sql.shuffle.partitions": "4",
                        "spark.ui.enabled": "false",
                        # single-JVM local mode: driver heap IS the
                        # executor heap; the sf0.1 end-to-end tests
                        # (curation, IVF round-trip) exceed the 1g
                        # default
                        "spark.driver.memory": "6g"})
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


def sf_sibling(scale: str) -> str:
    """Resolve a sibling scale directory (e.g. 'sf0.01', 'sf0.1') of
    the configured testdata root. Testdata locations/layouts change
    between rounds, so tests must derive every path from SF_DIR
    instead of hardcoding /root/testdata/..."""
    return os.path.join(os.path.dirname(SF_DIR.rstrip("/")), scale)


@pytest.fixture(scope="session")
def sf001_dir() -> str:
    p = sf_sibling("sf0.01")
    if not os.path.isdir(p):
        pytest.skip(f"sf0.01 testdata not present at {p}")
    return p


@pytest.fixture(scope="session")
def sf01_dir() -> str:
    p = sf_sibling("sf0.1")
    if not os.path.isdir(p):
        pytest.skip(f"sf0.1 testdata not present at {p}")
    return p


@pytest.fixture(scope="session")
def duck():
    import duckdb

    from esg_decarbonization_data_integration_and_data_pipline_spark.tables import TABLE_NAMES

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()
