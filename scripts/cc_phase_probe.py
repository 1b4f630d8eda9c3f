"""Phase-timing probe for the connected-components consumer family.

Times each serial phase of dedup_clusters_incremental (pair build,
old-map CC, incremental tail) and the sibling queries' end-to-end count,
with job descriptions so the phases are attributable. Measurement-only:
no committed artifact, results feed OPTIMIZATION_r17.md.

Usage: python scripts/cc_phase_probe.py [--reps 3]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mysql2psql_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def clear(spark):
    spark.catalog.clearCache()
    jsc = spark.sparkContext._jsc
    for rdd in jsc.getPersistentRDDs().values():
        rdd.unpersist(False)


def phases_incremental(spark):
    from mysql2psql_spark.operators.dedup import (
        connected_components,
        connected_components_incremental,
    )
    from mysql2psql_spark.operators.materialize import materialize
    from mysql2psql_spark.queries.text_q import dedup_ngram_jaccard

    out = {}
    t0 = time.perf_counter()
    pairs = materialize(
        dedup_ngram_jaccard(spark, SF_DIR).select("doc_a", "doc_b")
    )
    both_old = (F.col("doc_a") % 10 < 8) & (F.col("doc_b") % 10 < 8)
    t1 = time.perf_counter()
    spark.sparkContext.setJobDescription("cc_old")
    cc_old = materialize(connected_components(pairs.filter(both_old)))
    t2 = time.perf_counter()
    spark.sparkContext.setJobDescription("incremental tail")
    res = connected_components_incremental(
        cc_old, pairs.filter(~both_old)
    )
    t3 = time.perf_counter()
    n = res.count()
    t4 = time.perf_counter()
    spark.sparkContext.setJobDescription(None)
    out["build_plan"] = t1 - t0
    out["cc_old"] = t2 - t1          # includes pair-pipeline execution (count inside CC)
    out["incr_plan"] = t3 - t2
    out["final_count"] = t4 - t3
    out["total"] = t4 - t0
    out["rows"] = n
    return out


def end_to_end(spark, name):
    from mysql2psql_spark.queries import QUERIES

    t0 = time.perf_counter()
    df = QUERIES[name](spark, SF_DIR)
    n = df.count()
    return time.perf_counter() - t0, n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark("cc_phase_probe")
    names = ["dedup_clusters", "dedup_keep_canonical", "dedup_leakage_safe_split"]
    # warm the session once (python worker forks, codegen) on a cheap shape
    from mysql2psql_spark.queries import QUERIES

    QUERIES["text_unigram_surprisal"](spark, SF_DIR).count()
    clear(spark)

    phase_samples = []
    e2e = {n: [] for n in names}
    ctrl = []
    for r in range(args.reps):
        clear(spark)
        phase_samples.append(phases_incremental(spark))
        for n in names:
            clear(spark)
            e2e[n].append(end_to_end(spark, n)[0])
        clear(spark)
        t0 = time.perf_counter()
        QUERIES["text_unigram_surprisal"](spark, SF_DIR).count()
        ctrl.append(time.perf_counter() - t0)
        print(f"# rep {r+1}: {phase_samples[-1]}", file=sys.stderr)

    keys = ["build_plan", "cc_old", "incr_plan", "final_count", "total"]
    med = {k: statistics.median(s[k] for s in phase_samples) for k in keys}
    print("dedup_clusters_incremental phase medians:")
    for k in keys:
        print(f"  {k:12s} {med[k]:7.3f}")
    for n in names:
        print(f"{n}: median {statistics.median(e2e[n]):.3f} samples {[round(x,3) for x in e2e[n]]}")
    print(f"control text_unigram_surprisal: {statistics.median(ctrl):.3f} (floor 0.325)")


if __name__ == "__main__":
    main()
