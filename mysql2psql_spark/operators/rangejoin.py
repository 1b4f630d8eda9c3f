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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mysql2psql_spark.operators.timeutil import epoch_seconds, ts_family


# ~10M EXPLODED rows x ~40 B/row keeps the broadcast under ~half a GB —
# beyond this, the shuffle join on bin_id is the safe plan.
_BROADCAST_MAX_EXPLODED = 10_000_000


def binned_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_seconds: int = 7 * 86400,
    how: str = "inner",
    broadcast_intervals: bool | str = "auto",
) -> DataFrame:
    """Join rows of `points` to every interval with
    start <= point < end. Timestamps bin at `bin_seconds` granularity;
    choose it near the typical interval span (too small -> wide interval
    explode; too large -> fat bins, weak pruning).

    ``broadcast_intervals`` controls the build-side pin on the exploded
    interval table. Spark's size estimate for a
    Generate-over-local-relation is unreliable and without a hint it can
    choose to broadcast the POINTS side instead (observed at sf0.1:
    BuildLeft over 600k lineitem rows) — harmless locally, an executor
    OOM when points is the 100 TB fact table. But an UNCONDITIONAL pin
    has the dual failure: a caller with a too-large interval table gets
    a driver/executor OOM instead of the shuffle fallback the operator
    exists to provide. Default ``"auto"`` therefore measures the
    EXPLODED row count — sum over intervals of their bin fan-out, the
    quantity actually broadcast (a raw interval count would pass while a
    few million year-long intervals explode 50x into an OOM-sized
    build side) — and pins the broadcast only below
    ``_BROADCAST_MAX_EXPLODED`` rows. The measurement is one scan-side
    aggregate executed eagerly at call time (a planning pass, not lazy);
    pass True or False to skip it when the caller already knows the
    size.

    Timestamp families are ALIGNED before anything is computed: when
    exactly one side is an absolute instant (TIMESTAMP/LTZ) and the
    other is wall-clock (TIMESTAMP_NTZ or DATE), the instant side is
    cast to ``timestamp_ntz`` so the bin epochs AND the containment
    comparison all live in one (wall-clock) space. Without this, a
    non-UTC session computes point bins in naive space but interval
    bins in absolute space while Spark coerces the final comparison in
    session-local space — bin pruning and the filter then disagree by
    the timezone offset and silently drop matches near bin boundaries.
    """
    if not (
        broadcast_intervals is True
        or broadcast_intervals is False
        or broadcast_intervals == "auto"
    ):
        # any other string ("Auto", "AUTO", a typo) is truthy and would
        # silently PIN the broadcast — the exact OOM path auto exists to
        # prevent
        raise ValueError(
            f"broadcast_intervals must be True, False, or 'auto'; "
            f"got {broadcast_intervals!r}"
        )
    if ts_family(intervals, start_col) != ts_family(intervals, end_col):
        raise ValueError(
            f"interval bounds disagree on timestamp family: "
            f"{start_col} is {ts_family(intervals, start_col)}, "
            f"{end_col} is {ts_family(intervals, end_col)}"
        )
    p_fam = ts_family(points, point_col)
    i_fam = ts_family(intervals, start_col)
    # common comparison space: wall-clock unless BOTH sides are instants
    naive = p_fam == "naive" or i_fam == "naive"

    def _norm(c: Column) -> Column:
        return c.cast("timestamp_ntz") if naive else c

    points = points.withColumn("_rj_p", _norm(F.col(point_col)))
    intervals = intervals.withColumn("_rj_lo", _norm(F.col(start_col))).withColumn(
        "_rj_hi", _norm(F.col(end_col))
    )

    p_bin = F.floor(epoch_seconds("_rj_p", ntz=naive) / bin_seconds)
    i_lo = F.floor(epoch_seconds("_rj_lo", ntz=naive) / bin_seconds)
    i_hi = F.floor((epoch_seconds("_rj_hi", ntz=naive) - 1) / bin_seconds)
    # Degenerate intervals (end <= start, i_hi < i_lo): F.sequence would
    # generate a DESCENDING bin range (spurious join rows the containment
    # filter then discards) and the fan-out estimate would go NEGATIVE,
    # deflating the broadcast-size sum. Guard both: empty bin array (the
    # half-open [lo, hi) matches nothing) and a 0-clamped fan-out.
    span = F.greatest(F.lit(0), i_hi - i_lo + 1)
    bins = F.when(i_lo <= i_hi, F.sequence(i_lo, i_hi)).otherwise(
        F.array().cast("array<bigint>")
    )
    exploded = intervals.withColumn("_bin", F.explode(bins))
    if broadcast_intervals == "auto":
        n_exploded = intervals.select(F.sum(span).alias("n")).first()["n"]
        broadcast_intervals = (n_exploded or 0) <= _BROADCAST_MAX_EXPLODED
    if broadcast_intervals:
        exploded = F.broadcast(exploded)
    joined = points.withColumn("_bin", p_bin).join(exploded, "_bin", how)
    return joined.filter(
        (F.col("_rj_p") >= F.col("_rj_lo")) & (F.col("_rj_p") < F.col("_rj_hi"))
    ).drop("_bin", "_rj_p", "_rj_lo", "_rj_hi")
