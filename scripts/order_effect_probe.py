"""Measurement-order contamination probe: does a heavy predecessor query
inflate the NEXT query's measured wall time even after the standard
state release (clearCache + persistent-RDD sweep)?

Motivation (r9): in an interleaved run, ``dedup_clusters`` (always
measured right after the 12.9 s O(n^2) cosine anchor) read ~3.7 s while
``dedup_keep_canonical`` — the SAME connected-components pipeline plus
an extra anti-join, measured after a light query — read ~2.0 s. If the
delta is predecessor contamination (JVM GC debt / heap fragmentation
from the anchor's allocations), per-query medians depend on bench
ORDER, not code, and the release step needs a GC barrier.

Phases, same session:
  A: target x N consecutive (baseline, light predecessor)
  B: (anchor -> target) x N           (heavy predecessor)
  C: (anchor -> System.gc() -> target) x N   (heavy predecessor + GC barrier)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mysql2psql_spark.queries import QUERIES
from mysql2psql_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("PROBE_REPS", "5"))
TARGET = os.environ.get("PROBE_TARGET", "dedup_clusters")
ANCHOR = os.environ.get("PROBE_ANCHOR", "dedup_embedding_cosine")


def main() -> None:
    spark = get_spark(app_name="order_effect_probe")
    spark.sparkContext.setLogLevel("ERROR")
    for q in (TARGET, ANCHOR):
        QUERIES[q](spark, "/root/testdata/sf0.001").count()

    def release() -> None:
        spark.catalog.clearCache()
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist(False)

    def run(name: str) -> float:
        release()
        t0 = time.perf_counter()
        QUERIES[name](spark, SF).count()
        return time.perf_counter() - t0

    out: dict[str, list[float]] = {"A_consecutive": [], "B_after_anchor": [], "C_after_anchor_gc": []}
    for _ in range(N):
        out["A_consecutive"].append(round(run(TARGET), 3))
    for _ in range(N):
        run(ANCHOR)
        out["B_after_anchor"].append(round(run(TARGET), 3))
    for _ in range(N):
        run(ANCHOR)
        spark.sparkContext._jvm.System.gc()
        out["C_after_anchor_gc"].append(round(run(TARGET), 3))
    for k, v in out.items():
        print(f"{k}: median {statistics.median(v):.3f} samples {v}", flush=True)
    print(json.dumps({"target": TARGET, "anchor": ANCHOR, **out}))
    spark.stop()


if __name__ == "__main__":
    main()
