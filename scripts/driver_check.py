"""Simulate the grading driver's correctness gate exactly.

Unlike tests/test_oracle.py (which uses the engine's tuned session) and
scripts/probe_all.py (which only checks that queries run), this runs the
REAL gate conditions: a vanilla SparkSession (no UTC pin, no NTZ conf,
default shuffle partitions — the environment that exposed the round-3
TIMESTAMP_NTZ regression), every query from `__spark_entry__.queries()`,
and an exact order-insensitive compare against `oracle_sql()` in DuckDB.

Usage:
    python scripts/driver_check.py [--sf-dir /root/testdata/sf0.01] [--only name ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def value_hash(df) -> str:
    """Hash the frame through its RENDERED values, like the driver does.

    ``assert_frame_equal(check_dtype=False)`` treats int64 ``3`` and
    float64 ``3.0`` as equal, but the driver's hash compares rendered
    values, so a DuckDB HUGEINT column (pandas float64) diverges from a
    Spark BIGINT even when every value is numerically identical — the
    exact class that went red in r2/r3/r4.  Hashing ``to_csv`` output
    reproduces that sensitivity: ``3`` vs ``3.0`` hash differently.
    """
    import hashlib

    return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", nargs="*", help="check only these query names")
    ap.add_argument(
        "--out",
        default=None,
        help="write a JSON artifact (per-query ok/rows/hash + summary) — "
        "the committed full-sweep evidence channel for registry rows "
        "older than the driver's 50-row window (SURVEY §16 rule 20)",
    )
    args = ap.parse_args()

    import duckdb
    import pandas as pd
    from pyspark.sql import SparkSession

    # deliberately vanilla: the driver does NOT use session.get_spark
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as m

    qs, osql = m.queries(), m.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    names = args.only or list(qs)
    failures: list[str] = []
    results: dict[str, dict] = {}
    for i, name in enumerate(names, 1):
        try:
            got = qs[name](spark, args.sf_dir).toPandas()
            if name not in osql:
                results[name] = {"ok": True, "rows": len(got), "hash": None}
                print(f"[{i:3d}/{len(names)}] {name}: rows-only {len(got)}")
                continue
            want = con.execute(osql[name]).df()
            got = got[sorted(got.columns)].sort_values(
                by=sorted(got.columns)
            ).reset_index(drop=True)
            want = want[sorted(want.columns)].sort_values(
                by=sorted(want.columns)
            ).reset_index(drop=True)
            pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
            gh, wh = value_hash(got), value_hash(want)
            if gh != wh:
                # values are equal but the rendering differs (dtype
                # artifact, e.g. HUGEINT->float) — the driver's hash gate
                # WILL fail this even though the engine values are right
                failures.append(name)
                results[name] = {
                    "ok": False, "rows": len(got), "hash": gh[:8],
                    "err": f"render-diff vs oracle {wh[:8]}",
                }
                print(
                    f"[{i:3d}/{len(names)}] {name}: RENDER-DIFF "
                    f"(values equal, rendered hash {gh[:8]} != {wh[:8]}) — "
                    "fix the oracle's column types"
                )
                continue
            results[name] = {"ok": True, "rows": len(got), "hash": gh[:8]}
            print(f"[{i:3d}/{len(names)}] {name}: OK {len(got)} rows hash {gh[:8]}")
        except Exception:
            failures.append(name)
            results[name] = {
                "ok": False, "rows": None, "hash": None,
                "err": traceback.format_exc(limit=1).splitlines()[-1][:200],
            }
            print(f"[{i:3d}/{len(names)}] {name}: FAIL\n{traceback.format_exc(limit=2)}")

    if args.out:
        import json

        with open(args.out, "w") as f:
            json.dump(
                {
                    "sf_dir": args.sf_dir,
                    "n_queries": len(names),
                    "n_ok": len(names) - len(failures),
                    "failures": failures,
                    "queries": results,
                },
                f,
                indent=1,
                sort_keys=True,
            )
        print(f"# artifact written to {args.out}")

    if failures:
        print(f"\n{len(failures)} FAILED: {failures}", file=sys.stderr)
        return 1
    print(f"\nall {len(names)} queries match the oracle under a vanilla session")
    return 0


if __name__ == "__main__":
    sys.exit(main())
