"""Full-headline stall-attribution probe (r18, VERDICT r17 #1).

The r18 baseline bench read dedup_clusters_incremental at 15.7/2.5/14.4 s
and stream_near_dup_gate at 19.7/3.5/6.7 s across its three passes — the
r17-documented sporadic full-bench-only stall, landing on the adjacent
HEADLINE positions 186-190 in two of three passes. This probe replays the
bench loop EXACTLY (same session, warmups, setup seats, cache clears,
count protocol) but prints a wall-clock-timestamped line per sample as it
completes, so stall samples can be correlated with driver GC events
(run with JAVA_TOOL_OPTIONS=-Xlog:gc*:file=...:time,uptime) and with the
env-gated phase marks inside the two gate queries
(SPARK_GRAFT_GATE_DEBUG=1).

Usage:
  SPARK_GRAFT_GATE_DEBUG=1 \
  JAVA_TOOL_OPTIONS='-Xlog:gc*:file=/tmp/gc_probe.log:time,uptime' \
  python scripts/stall_probe.py [--passes 3] [--start 0] [--end 220]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from mysql2psql_spark.queries import QUERIES  # noqa: E402
from mysql2psql_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--end", type=int, default=len(HEADLINE))
    ap.add_argument("--no-warmup", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="stall_probe")
    from pyspark.sql import functions as F

    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    small = spark.range(1000).select((F.col("id") % 10).alias("k"), F.col("id").alias("v"))
    dim = spark.range(10).select(F.col("id").alias("k"))
    small.join(dim.hint("broadcast"), "k").groupBy("k").agg(F.sum("v")).collect()

    def _ident(batches):
        yield from batches

    spark.range(64).repartition(32).mapInPandas(_ident, "id long").count()

    warm_dir = os.environ.get("SPARK_GRAFT_WARMUP_SF_DIR", "/root/testdata/sf0.001")
    if not args.no_warmup and os.path.isdir(warm_dir):
        for name in HEADLINE:
            fn = QUERIES.get(name)
            if fn is not None:
                try:
                    fn(spark, warm_dir).count()
                except Exception as exc:
                    print(f"# warmup {name} failed: {exc}", file=sys.stderr)

    from mysql2psql_spark.operators.text import langid_profile_artifact
    from mysql2psql_spark.queries.graph_q import coorder_edges, sc_pairs
    from mysql2psql_spark.queries.text_q import _LANGID_K

    coorder_edges(spark, sf_dir)
    sc_pairs(spark, sf_dir)
    fn = QUERIES.get("o6_bucketed_join")
    if fn is not None:
        fn(spark, sf_dir)
    langid_profile_artifact(spark, sf_dir, k=_LANGID_K)

    def _release_persisted_rdds() -> None:
        spark.catalog.clearCache()
        jsc = spark.sparkContext._jsc
        for rdd in jsc.getPersistentRDDs().values():
            rdd.unpersist(False)

    names = HEADLINE[args.start : args.end]
    print(f"# probe: {len(names)} queries x {args.passes} passes", flush=True)
    for p in range(args.passes):
        for i, name in enumerate(names):
            fn = QUERIES.get(name)
            if fn is None:
                continue
            _release_persisted_rdds()
            t0 = time.perf_counter()
            wall0 = time.time()
            fn(spark, sf_dir).count()
            dur = time.perf_counter() - t0
            print(
                f"PROBE pass={p} pos={args.start + i} {name} "
                f"start={wall0:.3f} dur={dur:.3f}",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
