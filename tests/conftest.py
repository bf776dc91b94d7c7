"""Shared fixtures: one local SparkSession per test run + DuckDB oracle."""

from __future__ import annotations

import os

import duckdb
import pytest

from quacfka_spark.catalog import TABLES
from quacfka_spark.session import get_spark

SMOKE_DIR = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")
T2_DIR = os.environ.get("SPARK_GRAFT_T2_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("quacfka-spark-tests")
    yield s
    s.stop()


def make_duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


@pytest.fixture(scope="session")
def duck_smoke():
    con = make_duck(SMOKE_DIR)
    yield con
    con.close()


@pytest.fixture(scope="session")
def duck_t2():
    con = make_duck(T2_DIR)
    yield con
    con.close()
