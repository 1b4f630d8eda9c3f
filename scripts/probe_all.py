"""Probe-run EVERY registered query end-to-end at a small scale factor.

The round-3 regression (TIMESTAMP_NTZ epoch casts) rotted silently because
the driver's correctness window only covers 50 queries per round; queries
outside the window threw AnalysisException for a whole round before anyone
noticed. This script is the in-round guard: it executes all registered
queries (`.limit(1).collect()` after full plan analysis, so both
analysis-time and run-time failures surface) and exits non-zero if any
query raises.

Usage:
    python scripts/probe_all.py [--sf-dir /root/testdata/sf0.001] [--full]

`--full` collects complete results instead of limit(1) — slower, catches
data-dependent failures in late partitions.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--full", action="store_true")
    ap.add_argument("--only", nargs="*", help="probe only these query names")
    args = ap.parse_args()

    from mysql2psql_spark.queries import QUERIES
    from mysql2psql_spark.session import get_spark

    spark = get_spark(app_name="probe_all", shuffle_partitions="8")
    names = args.only or sorted(QUERIES)
    failures: dict[str, str] = {}
    for i, name in enumerate(names, 1):
        t0 = time.monotonic()
        try:
            df = QUERIES[name](spark, args.sf_dir)
            if args.full:
                n = df.count()
            else:
                n = len(df.limit(1).collect())
            status = f"ok rows>={n}"
        except Exception:
            failures[name] = traceback.format_exc(limit=3)
            status = "FAIL"
        print(f"[{i:3d}/{len(names)}] {name:40s} {status}  ({time.monotonic() - t0:.1f}s)")

    if failures:
        print(f"\n{len(failures)} FAILED:", file=sys.stderr)
        for name, tb in failures.items():
            print(f"\n=== {name} ===\n{tb}", file=sys.stderr)
        return 1
    print(f"\nall {len(names)} queries probe clean")
    return 0


if __name__ == "__main__":
    sys.exit(main())
