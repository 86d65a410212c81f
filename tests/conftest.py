"""Shared fixtures: one SparkSession per test session, plus a DuckDB
connection over the same fixture parquet (the driver's oracle setup,
SURVEY.md §5.2)."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "4g")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from amazonredshift_blueprints_spark.session import get_spark

    spark = get_spark("pytest")
    yield spark


@pytest.fixture(scope="session")
def duck():
    from amazonredshift_blueprints_spark.session import TABLES

    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(SF_DIR, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
