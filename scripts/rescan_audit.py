"""Rescan audit: flag registered queries whose executed plan scans the
SAME parquet file 3+ times — the signature of a multi-consumer frame
re-executing its producing pipeline (ReuseExchange cannot dedupe two
subtrees once column pruning differentiates them; persist is the fix
when the recompute is expensive, see operators/materialize.py).

This class of defect was found twice in round 10 before this audit
existed — w5's count branch and triangles_adjacency's two-sided adj
join (5.0 s vs 2.15 s) — and the audit's first full sweep then caught
sim_lsh_budget_sweep running three independent signature+cosine corpus
passes for nested budgets (fixed: shared candidate frame, 5 -> 3 scans).

A hit is NOT automatically a bug: multi-pass aggregation pyramids
(text_bm25's tf/df/total passes, text_vocab_coverage's vocab/coverage
passes) re-scan by DESIGN, because at 100 TB a column-pruned parquet
re-scan is cheaper than caching a token-level intermediate. Judge each
hit by what the repeated subtree recomputes: a scan is fine, a shuffle
or Arrow matmul pipeline is not.

Usage: python scripts/rescan_audit.py [--sf-dir /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mysql2psql_spark.queries import QUERIES
from mysql2psql_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    )
    ap.add_argument("--threshold", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark(app_name="rescan_audit")
    spark.sparkContext.setLogLevel("ERROR")
    hits = 0
    for name, fn in QUERIES.items():
        try:
            df = fn(spark, args.sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:
            print(f"{name}: ERROR {str(exc)[:80]}")
            hits += 1
            continue
        finally:
            spark.catalog.clearCache()
            for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                rdd.unpersist(False)
        files = re.findall(r"Location: InMemoryFileIndex[^\]]*\[([^\]]*)", plan)
        tabs = Counter(f.rsplit("/", 1)[-1] for f in files)
        multi = {t: c for t, c in tabs.items() if c >= args.threshold}
        if multi:
            cached = plan.count("InMemoryTableScan")
            print(f"{name}: {multi} (InMemoryTableScan={cached})")
            hits += 1
    print(f"# {hits} queries at >= {args.threshold} scans of one file "
          f"(out of {len(QUERIES)})")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
