"""JDBC (PostgreSQL) sink: the direct-load alternative to the CSV +
\\copy manifest path.

The reference hands loading to psql (bin/migrate.sh:53-78) in the strict
order DDL -> data -> views -> index/FK, with ON_ERROR_STOP and deferred
constraints (SURVEY.md §4 "load ordering"). This sink drives the same
order over one JDBC connection: executing DDL batches via the driver and
writing data with `df.write.jdbc` (executor-parallel, batched inserts).
Index/FK creation stays AFTER data on purpose — bulk loads into indexed
tables are the classic anti-pattern the reference's ordering avoids.

No PostgreSQL runs in the test container, so the connection-free pieces
(URL/properties building, statement ordering) are unit-tested and the
execution path is exercised against a mock connection.
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

from pyspark.sql import DataFrame


def psql_url(config: dict) -> tuple[str, dict[str, str]]:
    """JDBC URL + properties from the reference's parameters.json shape
    (the `psql` block, config/parameters.json.sample:9-14)."""
    pg = config.get("psql", {})
    url = f"jdbc:postgresql://{pg.get('host', '127.0.0.1')}:{pg.get('port', 5432)}/{pg.get('database', 'postgres')}"
    props = {
        "user": str(pg.get("user", "root")),
        "password": str(pg.get("password", "")),
        "driver": "org.postgresql.Driver",
    }
    return url, props


def load_statement_plan(
    ddl: Iterable[str],
    tables: Iterable[str],
    views: Iterable[str],
    index_fk: Iterable[str],
) -> list[tuple[str, Any]]:
    """The ordered load plan (bin/migrate.sh:58-78): each entry is
    ("sql", statement) executed on the driver connection or
    ("write", table_name) performed by executors via df.write.jdbc.
    Constraint checking is deferred across the data phase."""
    from mysql2psql_spark.sinks.ddl import load_epilogue, load_preamble

    plan: list[tuple[str, Any]] = [("sql", s) for s in ddl]
    plan.extend(("sql", s) for s in load_preamble())
    plan.extend(("write", t) for t in tables)
    plan.extend(("sql", s) for s in load_epilogue())
    plan.extend(("sql", s) for s in views)
    plan.extend(("sql", s) for s in index_fk)
    return plan


def execute_load(
    plan: list[tuple[str, Any]],
    frames: dict[str, DataFrame],
    url: str,
    props: dict[str, str],
    batchsize: int = 10_000,
    run_sql=None,
) -> None:
    """Run a load plan. `run_sql` executes one statement on the target
    (injectable for tests; defaults to ONE shared JDBC connection through
    the JVM, opened once and committed at the end — the reference pipes
    the whole script into a single psql session, so session SETs and
    SET CONSTRAINTS deferral must see the same connection to take
    effect). Data writes append via executor-parallel batched inserts on
    their own connections — the table exists from the DDL phase, so
    mode='append' never lets Spark re-derive DDL from the DataFrame
    schema, and index/FK DDL runs after data so per-executor connections
    don't weaken the deferral semantics.

    The shared connection COMMITS before every write phase: executors
    open their own connections, which would otherwise block on the
    uncommitted DDL locks forever (caught live by the embedded-Derby
    integration test; the same lock wait happens on PostgreSQL).
    Constraint deferral therefore protects the driver-side statement
    phases — data-phase integrity comes from creating index/FK DDL
    after the data, which is the ordering the plan encodes anyway."""
    conn = None
    if run_sql is None:
        spark = next(iter(frames.values())).sparkSession
        jvm = spark._jvm
        conn = jvm.java.sql.DriverManager.getConnection(url, props["user"], props["password"])
        conn.setAutoCommit(False)
        statement = conn.createStatement()
        run_sql = statement.execute
    try:
        for kind, payload in plan:
            if kind == "sql":
                run_sql(payload)
            else:
                if conn is not None:
                    conn.commit()  # release DDL locks to the executors
                frames[payload].write.mode("append").option("batchsize", str(batchsize)).jdbc(
                    url, payload, properties=props
                )
        if conn is not None:
            conn.commit()
    finally:
        if conn is not None:
            conn.close()
