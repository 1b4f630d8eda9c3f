"""Codegen-class-cache thrash probe — the instrument that root-caused
the cross-round bench drift (SURVEY §13, r10).

Hypothesis it tests: `spark.sql.codegen.cache.maxEntries` (default 100
generated classes) thrashes in sessions that cycle many distinct query
shapes, so big-plan queries pay Janino recompiles on EVERY execution —
invisible in short 2-shape A/B sessions, dominant in the 170-shape bench
session, and POSITION-DETERMINISTIC for a fixed query order (the same
victims evict at the same points every round, which masqueraded as
reproducible per-query regressions in the r8/r9 driver artifacts).

Method: one session per cache size; warm every shape at sf0.001; then
run `--others` (a rotation of distinct shapes, evicting the cache)
followed by the target, repeated; report the target's median. The ONLY
variable across invocations is the cache size.

Measured (2026-08-14, sf0.1, 11-shape rotation, same load band):

    maxEntries=100  -> graph_triangles median 3.40 s  [3.63 3.17 3.84 3.06]
    maxEntries=5000 -> graph_triangles median 1.93 s  [3.70 1.96 1.90 1.76]
                       (first sample = its one compile, then cached)

Usage: python scripts/codegen_cache_probe.py 100
       python scripts/codegen_cache_probe.py 5000
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from mysql2psql_spark.queries import QUERIES

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM = os.environ.get("SPARK_GRAFT_WARMUP_SF_DIR", "/root/testdata/sf0.001")
TARGET = os.environ.get("PROBE_TARGET", "graph_triangles")
REPS = int(os.environ.get("PROBE_REPS", "4"))
OTHERS = os.environ.get(
    "PROBE_OTHERS",
    "dedup_clusters,text_unigram_surprisal,dedup_keep_canonical,"
    "graph_pagerank,graph_degree_distribution,dedup_minhash_lsh,"
    "s4_scan_projection,text_approx_strata,o6_bucketed_join,"
    "q01_pricing_summary,text_bm25",
).split(",")


def main() -> None:
    max_entries = sys.argv[1] if len(sys.argv) > 1 else "100"
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("codegen_cache_probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir", f"/tmp/spark_graft_warehouse_cg{max_entries}")
        .config("spark.sql.codegen.cache.maxEntries", max_entries)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def release() -> None:
        spark.catalog.clearCache()
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist(False)

    for n in [TARGET, *OTHERS]:
        QUERIES[n](spark, WARM).count()
    samples = []
    for _ in range(REPS):
        for n in OTHERS:
            release()
            QUERIES[n](spark, SF).count()
        release()
        t0 = time.perf_counter()
        QUERIES[TARGET](spark, SF).count()
        samples.append(round(time.perf_counter() - t0, 3))
    print(
        f"maxEntries={max_entries} {TARGET} median "
        f"{statistics.median(samples):.3f} samples {samples} "
        f"load {os.getloadavg()}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
