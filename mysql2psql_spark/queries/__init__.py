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
        graph_q,
        migration_q,
        similarity_q,
        text_q,
        tpch_deep_q,
    )


_load_all()

# ---------------------------------------------------------------------------
# Driver presentation order — staleness rotation. The correctness driver
# walks ``queries()`` in dict order under a bounded budget (50 entries per
# round), so presentation order decides which operators get a driver row.
# Instead of a hand-curated list (which round 2 showed can forget queries —
# dedup_minhash_lsh/dedup_simhash/agg_approx_distinct never earned a driver
# row because they sat past position 50 both rounds), derive the order from
# the committed CORRECTNESS_r*.json history: queries with the OLDEST latest
# green row come first (never-green queries, including brand-new ones, sort
# before everything). With an N-round window of 50 checks each, every query
# is re-verified at least once per ceil(len(registry)/50)+ rounds and nothing
# can silently go stale.
# ---------------------------------------------------------------------------
import json as _json
import re as _re
from pathlib import Path as _Path


def _last_green_rounds() -> dict[str, int]:
    """Map query name -> most recent round with a fully-green driver row
    (rows+schema+hash all true). Queries absent from every file — or never
    green — are simply absent. Reads CORRECTNESS_r*.json from the repo root
    (two levels above this package); silent empty dict if none exist yet."""
    root = _Path(__file__).resolve().parents[2]
    last: dict[str, int] = {}
    for path in sorted(root.glob("CORRECTNESS_r*.json")):
        m = _re.search(r"CORRECTNESS_r(\d+)\.json$", path.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            data = _json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        for name, row in data.items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                last[name] = max(last.get(name, 0), rnd)
    return last


def driver_ordered(mapping: dict[str, object]) -> dict:
    """Return ``mapping`` reordered stalest-first: queries whose latest
    fully-green driver row is oldest (never-green = round 0) come first;
    ties keep registration order. Applied identically to QUERIES and ORACLE
    so the driver's 50-query budget always lands on the same names."""
    last = _last_green_rounds()
    names = list(mapping)
    order = sorted(range(len(names)), key=lambda i: (last.get(names[i], 0), i))
    return {names[i]: mapping[names[i]] for i in order}
