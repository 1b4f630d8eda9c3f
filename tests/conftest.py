"""Shared fixtures: one SparkSession per test session + a DuckDB oracle
connection with the testdata tables registered as views (mirroring the
driver's correctness harness)."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mysql2psql_spark.session import get_spark
from mysql2psql_spark.sources.parquet import TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="mysql2psql_spark_tests", shuffle_partitions="8")
    yield spark


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for sf_dir in {SF_DIR, SF_DIR_ORACLE}:
        schema = sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "_")
        con.execute(f"CREATE SCHEMA IF NOT EXISTS {schema}")
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {schema}.{t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
    yield con
    con.close()


@pytest.fixture(scope="session")
def spark_prop(spark):
    # alias so hypothesis-driven tests share the session fixture without
    # hypothesis seeing a function-scoped fixture warning
    return spark
