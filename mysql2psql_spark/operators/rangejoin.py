"""Binned range join: points joined into covering intervals.

Spark's only native plan for `point BETWEEN start AND end` is a broadcast
nested-loop (fine for a handful of intervals, quadratic death at scale).
The scale shape bins the time axis: every interval explodes to the bins
it overlaps, every point lands in exactly one bin, and the pair space
collapses to a hash-partitioned equi-join on bin_id + a residual
containment filter. Cost: |points| + sum(interval_span/bin_width) rows
through one shuffle — linear, skew-bounded by bin width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mysql2psql_spark.operators.timeutil import epoch_of


def binned_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_seconds: int = 7 * 86400,
    how: str = "inner",
    broadcast_intervals: bool = True,
) -> DataFrame:
    """Join rows of `points` to every interval with
    start <= point < end. Timestamps bin at `bin_seconds` granularity;
    choose it near the typical interval span (too small -> wide interval
    explode; too large -> fat bins, weak pruning).

    ``broadcast_intervals`` (default True) pins the build side to the
    exploded interval table. Without the hint Spark's size estimate for
    a Generate-over-local-relation is unreliable and it can choose to
    broadcast the POINTS side instead (observed at sf0.1: BuildLeft over
    600k lineitem rows) — harmless locally, an executor OOM when points
    is the 100 TB fact table. Pass False only when the interval table
    itself is too large to broadcast; the join then falls back to a
    shuffle hash/merge join on bin_id, which is the operator's whole
    reason to exist."""
    # dtype-aware epoch (NTZ-safe, session-tz-independent) so point and
    # interval bins stay aligned even when the two frames resolved the
    # timestamp family differently
    ep_p = epoch_of(points, point_col)
    ep_lo = epoch_of(intervals, start_col)
    ep_hi = epoch_of(intervals, end_col)

    p_bin = F.floor(ep_p(point_col) / bin_seconds)
    i_lo = F.floor(ep_lo(start_col) / bin_seconds)
    i_hi = F.floor((ep_hi(end_col) - 1) / bin_seconds)
    exploded = intervals.withColumn("_bin", F.explode(F.sequence(i_lo, i_hi)))
    if broadcast_intervals:
        exploded = F.broadcast(exploded)
    joined = points.withColumn("_bin", p_bin).join(exploded, "_bin", how)
    return joined.filter(
        (F.col(point_col) >= F.col(start_col)) & (F.col(point_col) < F.col(end_col))
    ).drop("_bin")
