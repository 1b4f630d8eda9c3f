"""Driver-contract query registry.

Every operator from SURVEY.md §2 (plus the large-scale extension surface)
registers a named query here: a PySpark callable ``(spark, sf_dir) ->
DataFrame`` and, when SQL-expressible, an equivalent ANSI SQL string the
DuckDB oracle runs on the same Parquet tables.

Determinism rules (so the driver's order-insensitive value hash matches):
- every computed column is aliased identically in Spark and SQL;
- float aggregates go through DECIMAL for exact sums, then ROUND + DOUBLE;
- LIMIT/top-k always has a unique tie-break key;
- timestamps in results are rendered as formatted strings or epoch seconds.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; ``oracle=None`` marks a non-SQL-expressible
    operator (the driver then records a weaker rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def _load_all() -> None:
    # Import side-effect: each module registers its queries.
    from mysql2psql_spark.queries import (  # noqa: F401
        analytics_q,
        catalog_q,
        core,
        dedup_q,
        embedding_q,
        events_q,
        functions_q,
        migration_q,
        similarity_q,
        text_q,
    )


_load_all()
