"""Skew-aware join: salting for hot keys (SURVEY.md §7 "100 TB posture").

AQE's skew-join splitting (on in session.get_spark) handles most runtime
skew for sort-merge joins; salting is the explicit fallback for the cases
AQE can't fix — e.g. a broadcast-ineligible dimension with one degenerate
hot key, or aggregations where a single groupBy key dominates.

`salted_join` replicates the build side R times and scatters the probe
side across the replicas: probe rows get salt = hash(row) % R, build rows
are exploded to all R salts, and the join key becomes (key, salt) — the
hot key's rows now spread over R reducers instead of one. Results are
row-identical to the plain join (verified in tests/test_operators.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `probe` with `build` on column `on`, salted `salts` ways.

    `build` is replicated x salts (use for the smaller side); `probe` rows
    are scattered deterministically by a hash of their whole row so even a
    single hot key spreads evenly. Output columns match probe.join(build).
    """
    probe_s = probe.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in probe.columns]), F.lit(salts))
    )
    build_s = build.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salts)]))
    )
    return probe_s.join(build_s, [on, "_salt"], how).drop("_salt")
