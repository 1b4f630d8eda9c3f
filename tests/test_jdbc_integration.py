"""Real-connection JDBC integration: embedded Derby (shipped with
Spark) stands in for the MySQL/PostgreSQL endpoints absent from the
container. Exercises the actual network-free but fully real JDBC code
paths: sources/jdbc.py's subquery + partitioned range reads and
sinks/jdbc_sink.py's shared-connection statement execution +
executor-parallel df.write.jdbc appends.

Dialect-specific pieces (MySQL information_schema introspection, the
PG session preamble) stay plan-tested — Derby speaks neither — but the
connection handling, bounds discovery, partitioned scan, and load
ordering here run against a live database.
"""

from __future__ import annotations

import pytest

from mysql2psql_spark import schema_ir as ir
from mysql2psql_spark.sinks.jdbc_sink import execute_load
from mysql2psql_spark.sources.jdbc import _jdbc_df, read_table

URL = "jdbc:derby:memory:it_db;create=true"
PROPS = {"user": "app", "password": "app", "driver": "org.apache.derby.iapi.jdbc.AutoloadedDriver"}


def test_jdbc_end_to_end_embedded_derby(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "it's quoted")], "id int, s string"
    )
    # sink: DDL + executor-parallel append over ONE shared driver
    # connection for the statement phase (the real default run_sql)
    plan = [
        ("sql", "CREATE TABLE APP.T (ID INT, S VARCHAR(30))"),
        ("write", "APP.T"),
        ("sql", "CREATE INDEX T_ID_X ON APP.T (ID)"),
    ]
    execute_load(plan, {"APP.T": df}, URL, PROPS)

    # source: generic subquery read (the catalog-read building block)
    n = _jdbc_df(spark, URL, "SELECT COUNT(*) AS c FROM APP.T", PROPS).collect()[0][0]
    assert n == 3

    # source: partitioned range read off the numeric PK, bounds included
    table = ir.new_table(
        "T",
        [
            ir.new_column("ID", "int", nullable=False, is_pk=True),
            ir.new_column("S", "varchar", size="30"),
        ],
    )
    back = read_table(spark, URL, "APP", table, PROPS, num_partitions=2)
    assert back.rdd.getNumPartitions() == 2  # range-split actually applied
    rows = sorted((r["ID"], r["S"]) for r in back.collect())
    assert rows == [(1, "a"), (2, "b"), (3, "it's quoted")]

    # pushdown: the where clause reaches the JDBC scan
    filtered = read_table(spark, URL, "APP", table, PROPS, num_partitions=2, where="ID > 1")
    assert filtered.count() == 2
