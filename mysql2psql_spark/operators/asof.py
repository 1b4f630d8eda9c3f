"""As-of join: for each left row, the most recent right row at or before
its timestamp (per key) — the operator Spark's join API lacks (SURVEY.md
§2.3 note; the brief's canonical "custom operator" case).

Execution shape: the scalable form is NOT a range join (which explodes to
|left| x |matching right| pairs before picking one). Union both sides
tagged, sort within each key by (time, tag, tiebreak) in ONE window pass,
forward-fill the right side's payload with last(..., ignoreNulls), keep
the left rows. Cost: one shuffle on the key + a per-key sort — linear in
|left| + |right| regardless of how many right rows precede each left row.
Right rows sort before left rows at identical timestamps (tag order), and
the tiebreak column makes the fill deterministic when right has duplicate
timestamps per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    payload: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Left as-of join: left columns + the payload columns of the latest
    right row with right_time <= left_time for the same key (NULLs when
    no prior right row exists). `tiebreak` orders equal-timestamp right
    rows (highest wins); defaults to the first payload column."""
    tiebreak = tiebreak or payload[0]
    # payload rides in ONE struct so every filled column comes from the
    # same right row even when individual payload values are NULL
    r_payload = F.struct(*[F.col(c) for c in payload])
    r_tag = right.select(
        F.col(key).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_tag"),
        F.col(tiebreak).alias("_tb"),
        r_payload.alias("_p"),
    )
    l_tag = left.select(
        F.col(key).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(right.schema[tiebreak].dataType).alias("_tb"),
        F.lit(None).cast(r_tag.schema["_p"].dataType).alias("_p"),
        F.struct(*left.columns).alias("_left"),
    )
    r_tag = r_tag.withColumn("_left", F.lit(None).cast(l_tag.schema["_left"].dataType))
    win = (
        W.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_tag").asc(), F.col("_tb").asc_nulls_first())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = l_tag.unionByName(r_tag).select(
        "_tag", "_left", F.last("_p", ignorenulls=True).over(win).alias("_f")
    )
    return filled.filter(F.col("_tag") == 1).select(
        *[F.col(f"_left.{c}").alias(c) for c in left.columns],
        *[F.col(f"_f.{c}").alias(c) for c in payload],
    )


def asof_nearest(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    payload: list[str],
    tolerance: int,
    tiebreak: str | None = None,
) -> DataFrame:
    """Nearest-within-tolerance as-of join on NUMERIC time columns (cast
    timestamps to epoch seconds first): for each left row, the right row
    (same key) minimizing |left_time - right_time|, subject to the
    absolute difference being <= ``tolerance``; ties between an earlier
    and a later candidate at equal distance prefer the EARLIER (backward)
    row. Payload columns are NULL when no right row is in tolerance.

    Same linear execution shape as :func:`asof_join` — one shuffle on the
    key, one per-key sort — with BOTH direction candidates computed in a
    single window pass: last-non-null over the preceding frame (latest
    right <= t) and first-non-null over the following frame (earliest
    right > t) share the partitioning and ordering, so Spark evaluates
    them in one Window operator, not two sorts. A plain range join within
    +/-tolerance would materialize every in-window pair first; this never
    does.

    Deterministic tie rules, mirrored by the SQL oracle in
    queries/events_q.py: equal-timestamp right rows resolve by highest
    ``tiebreak`` on the backward side and lowest on the forward side
    (sort-order inheritance from the shared window ordering).
    """
    tiebreak = tiebreak or payload[0]
    r_payload = F.struct(
        F.col(right_time).cast("long").alias("_rt"), *[F.col(c) for c in payload]
    )
    r_tag = right.select(
        F.col(key).alias("_k"),
        F.col(right_time).cast("long").alias("_t"),
        F.lit(0).alias("_tag"),
        F.col(tiebreak).alias("_tb"),
        r_payload.alias("_p"),
    )
    l_tag = left.select(
        F.col(key).alias("_k"),
        F.col(left_time).cast("long").alias("_t"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(right.schema[tiebreak].dataType).alias("_tb"),
        F.lit(None).cast(r_tag.schema["_p"].dataType).alias("_p"),
        F.struct(*left.columns).alias("_left"),
    )
    r_tag = r_tag.withColumn("_left", F.lit(None).cast(l_tag.schema["_left"].dataType))
    order = [F.col("_t").asc(), F.col("_tag").asc(), F.col("_tb").asc_nulls_first()]
    back_w = (
        W.partitionBy("_k").orderBy(*order).rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    fwd_w = (
        W.partitionBy("_k").orderBy(*order).rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    filled = l_tag.unionByName(r_tag).select(
        "_tag",
        "_left",
        "_t",
        F.last("_p", ignorenulls=True).over(back_w).alias("_b"),
        F.first("_p", ignorenulls=True).over(fwd_w).alias("_f"),
    )
    lrows = filled.filter(F.col("_tag") == 1)
    db = F.col("_t") - F.col("_b._rt")
    df_ = F.col("_f._rt") - F.col("_t")
    back_ok = F.col("_b").isNotNull() & (db <= tolerance)
    fwd_ok = F.col("_f").isNotNull() & (df_ <= tolerance)
    use_back = back_ok & (~fwd_ok | (db <= df_))
    chosen = F.when(use_back, F.col("_b")).when(fwd_ok, F.col("_f"))
    out = lrows.select(
        *[F.col(f"_left.{c}").alias(c) for c in left.columns],
        *[chosen[c].alias(c) for c in payload],
        (F.col("_t") - chosen["_rt"]).alias("_asof_delta"),
    )
    return out
