"""Distributed analytic-function decompositions.

Exact two-phase alternatives to per-key total-order windows. A
``PERCENT_RANK()/CUME_DIST() OVER (PARTITION BY k ORDER BY ...)`` funnels
every row of a key through ONE window task — at 100 TB with low key
cardinality that task is the job. When the ordering key is UNIQUE, both
functions are pure arithmetic on the row's exact global rank r within its
key (r-1)/(n-1) and r/n, and the rank itself decomposes into
embarrassingly parallel pieces.

Measured trade (r10, interleaved 5-run medians at sf0.1, 100k events /
5 keys): the plain window reads 0.21 s, this decomposition 0.99-1.12 s —
the cut aggregation, offset broadcast, and final join are FIXED costs
that only pay off when a single key's stream exceeds one task's sort
capacity (roughly >10^8 rows/key). Queries at test scale keep the window
(queries/core.py::w5_distribution_functions documents the caveat); this
operator is the cluster-scale path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def distribution_ranks(
    df: DataFrame,
    part_col: str,
    order_cols: list[str],
    value_col: str | None = None,
    n_buckets: int = 64,
    accuracy: int = 1000,
) -> DataFrame:
    """Attach exact ``rank`` (1-based within ``part_col`` under
    ``order_cols``), ``n`` (partition size), ``pct_rank`` and ``cume``
    columns WITHOUT a per-partition total-order window.

    Requires ``order_cols`` to be a unique key within each partition
    (rank == row_number; percent_rank's tie semantics collapse to it).

    Decomposition: approximate percentile cuts on ``value_col`` (default:
    the first ordering column) split each partition into ``n_buckets``
    RANGE buckets — cut accuracy shifts only bucket balance, never a
    rank, because equal values always land in the same bucket (the
    bucket predicate uses the value alone, a prefix of the ordering).
    A row_number window then runs per (partition, bucket) — cardinality
    |keys| x n_buckets instead of |keys| — and each bucket's starting
    offset comes from a broadcast count table whose prefix-sum window is
    bounded at n_buckets rows per key. Three exchanges total (cut
    sketch, bucketed window, count agg), all either sketch-sized or
    n_buckets-finer than the window they replace.

    ``value_col``, if passed explicitly, must equal ``order_cols[0]``:
    the bucketing proof above covers ONLY the value-is-ordering-prefix
    configuration (equal values share a bucket because the bucket
    predicate uses the value alone); any other value column would
    silently scramble ranks, so it raises instead (ADVICE r10).
    """
    if value_col is not None and value_col != order_cols[0]:
        raise ValueError(
            f"value_col must be order_cols[0] ({order_cols[0]!r}) — the "
            f"range-bucket decomposition is only rank-exact when the bucket "
            f"value is a prefix of the ordering; got value_col={value_col!r}"
        )
    value_col = value_col or order_cols[0]
    probs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = df.groupBy(part_col).agg(
        F.percentile_approx(value_col, probs, accuracy).alias("_cuts")
    )
    bucketed = (
        df.join(F.broadcast(cuts), part_col)
        .withColumn(
            "_b",
            F.aggregate(
                F.col("_cuts"),
                F.lit(0),
                lambda acc, c: acc
                + F.when(F.col(value_col) > c, F.lit(1)).otherwise(F.lit(0)),
            ),
        )
        .drop("_cuts")
    )
    wl = W.partitionBy(part_col, "_b").orderBy(*order_cols)
    ranked = bucketed.withColumn("_local", F.row_number().over(wl))
    # counts from the pre-window frame: the window subtree and the count
    # subtree canonicalize differently after column pruning, so persist
    # or recompute are the options — the count recompute is a partial
    # (map-side combined) aggregate whose exchange carries |keys| x
    # n_buckets rows, cheaper than caching the full ranked frame
    counts = bucketed.groupBy(part_col, "_b").agg(F.count("*").alias("_n"))
    wo = W.partitionBy(part_col).orderBy("_b")
    offsets = counts.select(
        part_col,
        "_b",
        F.coalesce(
            F.sum("_n").over(wo.rowsBetween(W.unboundedPreceding, -1)), F.lit(0)
        ).alias("_off"),
        F.sum("_n").over(W.partitionBy(part_col)).alias("_tot"),
    )
    joined = ranked.join(F.broadcast(offsets), [part_col, "_b"])
    rank: Column = (F.col("_off") + F.col("_local")).cast("bigint")
    n: Column = F.col("_tot").cast("bigint")
    return (
        joined.withColumn("rank", rank)
        .withColumn("n", n)
        .withColumn(
            "pct_rank",
            F.when(n > 1, (rank - 1).cast("double") / (n - 1)).otherwise(F.lit(0.0)),
        )
        .withColumn("cume", rank.cast("double") / n)
        .drop("_b", "_local", "_off", "_tot")
    )
