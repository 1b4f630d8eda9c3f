"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over mysql2psql_spark: the query registry in
``mysql2psql_spark.queries`` carries one named query per implemented
operator from SURVEY.md §2 (plus the large-scale extension surface) and
its DuckDB oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mysql2psql_spark.queries import ORACLE, QUERIES, driver_ordered


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-shaped pricing summary) on sf0.001."""
    return QUERIES["q01_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered so a
    budget-limited driver run reaches the queries that lacked a
    CORRECTNESS_r01 row first (round 1 stopped after 50 entries)."""
    return driver_ordered(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return driver_ordered(ORACLE)
