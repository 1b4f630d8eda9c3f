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


def _driver_history() -> tuple[dict[str, int], dict[str, int]]:
    """Read CORRECTNESS_r*.json from the repo root (two levels above this
    package) and return ``(last_any, last_green)``: per query name, the most
    recent round with ANY driver row, and the most recent round with a
    fully-green row (rows+schema+hash all true). Names absent from every
    file appear in neither dict. Silent empty dicts if no files exist yet."""
    root = _Path(__file__).resolve().parents[2]
    last_any: dict[str, int] = {}
    last_green: dict[str, int] = {}
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
            if not isinstance(row, dict):
                continue
            last_any[name] = max(last_any.get(name, 0), rnd)
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                last_green[name] = max(last_green.get(name, 0), rnd)
    return last_any, last_green


def driver_ordered(mapping: dict[str, object]) -> dict:
    """Return ``mapping`` reordered so the driver's bounded budget (50
    entries per round) lands on the queries that most need a driver row:

    1. latest-row-RED first — a query whose most recent driver row failed
       must be re-checked the very next round (its fix has landed, or the
       failure is still live; either way the contract needs the row);
    2. never-driver-checked next — new queries earn their first row;
    3. everything else stalest-green-first — oldest latest-green round.

    Ties keep registration order. Round 5 showed why the red tier must
    outrank new registrations: 56 new queries flooded the never-checked
    tier and the one red query (``text_pack_sequences``, fixed that same
    round) was starved out of the window for a full round. Applied
    identically to QUERIES and ORACLE so the budget lands on the same
    names for both."""
    last_any, last_green = _driver_history()
    names = list(mapping)

    def key(i: int) -> tuple[int, int, int]:
        n = names[i]
        any_r, green_r = last_any.get(n, 0), last_green.get(n, 0)
        if any_r > green_r:  # latest driver row was red
            tier = 0
        elif any_r == 0:  # never driver-checked
            tier = 1
        else:
            tier = 2
        return (tier, green_r, i)

    order = sorted(range(len(names)), key=key)
    return {names[i]: mapping[names[i]] for i in order}
