"""Distributed dense-index assignment (0-based contiguous ordinals).

A global ``ROW_NUMBER() OVER (ORDER BY ...)`` funnels EVERY row through
one window task — the textbook single-partition scale killer whenever
the frame being indexed grows with the data (a training corpus being
sharded, a graph's vertex set being mapped to embedding rows). This
module holds the engine's one sanctioned shape for dense global indexes,
extracted from the text-export path (it started life as
``operators/text.py::global_ordinals``; the graph family's vertex
indexes, flagged |V|-scale-unsafe in the r10 verdict, reuse it now).

Two-phase decomposition — no full-data total order anywhere:

1. rank rows within ``n_buckets`` hash buckets keyed by
   ``order_cols[0] % n_buckets`` (one bounded window per bucket, all
   buckets in parallel);
2. compute each bucket's starting offset from the bucket-count table —
   ``n_buckets`` rows, so its prefix-sum window is trivially bounded —
   and broadcast-join it back.

The resulting total order is ``(bucket, *order_cols)``: deterministic,
reproducible at any parallelism, and restatable in ANSI SQL as
``ROW_NUMBER() OVER (ORDER BY col0 % n, col0, ...) - 1`` — which is how
the DuckDB oracles of every consumer reproduce it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def dense_index(
    df: DataFrame,
    order_cols: list[str],
    n_buckets: int = 64,
    out_col: str = "ordinal",
) -> DataFrame:
    """Attach 0-based GLOBAL contiguous ordinals under the total order
    ``(order_cols[0] % n_buckets, *order_cols)``.

    ``order_cols[0]`` must be an integer-typed column (the bucket key is
    its modulo); ``order_cols`` together must be unique per row for the
    index to be a bijection. Plan shape: one bucket-keyed window + one
    ``n_buckets``-row broadcast join — no unpartitioned window exists in
    the executed plan (pinned in tests/test_plans.py).
    """
    lead = F.col(order_cols[0])
    bucket = (lead % n_buckets).alias("_b")
    win = W.partitionBy("_b").orderBy(*order_cols)
    ranked = df.withColumn("_b", bucket).withColumn(
        "_local", F.row_number().over(win) - 1
    )
    counts = ranked.groupBy("_b").agg(F.count("*").alias("_n"))
    offsets = counts.select(
        "_b",
        (
            F.sum("_n").over(W.orderBy("_b").rowsBetween(W.unboundedPreceding, -1))
        ).alias("_off"),
    ).fillna({"_off": 0})
    return (
        ranked.join(F.broadcast(offsets), "_b")
        .withColumn(out_col, (F.col("_off") + F.col("_local")).cast("bigint"))
        .drop("_b", "_local", "_off", "_n")
    )


def dense_index_sql(order_cols: list[str], n_buckets: int = 64) -> str:
    """The ordinal as an ANSI-SQL window expression — the oracle twin of
    :func:`dense_index`, generated from the same ordering contract so
    the two cannot drift. Embed as
    ``{expr} AS ordinal`` over the same input relation."""
    lead = order_cols[0]
    cols = ", ".join([f"{lead} % {n_buckets}"] + list(order_cols))
    return f"ROW_NUMBER() OVER (ORDER BY {cols}) - 1"
