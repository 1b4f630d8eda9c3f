"""Hot-key skew probe: rerun the dedup shuffles with 30% of the corpus
sharing ONE document text (the r6/r7 verdict's missing probe — the
uniform scale probe replicates everything evenly, so no shuffle ever saw
a hot key).

What the hot text induces, by construction:

- ``dedup_minhash_lsh``: all hot docs have identical shingle sets, so
  identical MinHash signatures, so ALL of them land in the SAME
  (band, key) bucket for every band — the bucket self-join's worst
  case: with h hot docs the join emits ~bands * h^2 / 2 candidate rows
  out of a handful of hot keys (h=1500: ~9M rows from 8 keys), exactly
  the shape AQE's skew-join splitting exists for. Note the OUTPUT is
  genuinely quadratic too (every hot pair IS a true duplicate pair, so
  C(h,2) ~ 1.1M result rows are semantically owed) — the probe
  separates "paying for owed output" from "one straggler task pays for
  it alone".
- ``dedup_clusters``: those ~1.1M verified pairs become edges of one
  giant component, pushing past the <=1M-edge driver union-find gate
  (operators/dedup.py) onto the distributed min-label path — the gate's
  fallback exercised under the exact condition it was built for.

Usage: python scripts/skew_probe.py [--hot-frac 0.3] [--only a,b]
Writes the skewed corpus under /tmp/skew_probe/ and prints one line per
op: uniform wall vs skewed wall and output rows. Findings land in the
README probe table.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mysql2psql_spark.queries import QUERIES
from mysql2psql_spark.session import get_spark

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = "/tmp/skew_probe"

PROBED = ["dedup_minhash_lsh", "dedup_simhash", "dedup_clusters", "dedup_keep_canonical"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hot-frac", type=float, default=0.3)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()
    probed = PROBED if args.only is None else [
        n for n in args.only.split(",") if n in QUERIES
    ]

    from pyspark.sql import functions as F

    spark = get_spark(app_name="skew_probe")
    spark.sparkContext.setLogLevel("ERROR")

    shutil.rmtree(DST, ignore_errors=True)
    os.makedirs(DST)

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    # one deterministic hot text, long enough to produce a full shingle
    # set; doc_id % denominators pick a stable ~hot_frac of the corpus
    hot_text = docs.orderBy("doc_id").limit(1).collect()[0]["text"]
    den = 1000
    num = int(args.hot_frac * den)
    skewed = docs.withColumn(
        "text",
        F.when(F.pmod(F.col("doc_id"), F.lit(den)) < F.lit(num), F.lit(hot_text))
        .otherwise(F.col("text")),
    )
    skewed.write.mode("overwrite").parquet(f"{DST}/documents.parquet")
    # DST must be a COMPLETE sf dir, not just documents: --only accepts
    # any registry query, and a probed query that loads a second table
    # (embeddings, lineitem, ...) would otherwise die path-not-found at
    # measurement time (ADVICE r8). Symlinks — zero copy cost, and the
    # non-document tables are identical to SRC by construction.
    for entry in os.listdir(SRC):
        src_path = os.path.join(SRC, entry)
        dst_path = os.path.join(DST, entry)
        # lexists, not exists: a dangling symlink (SRC contents changed
        # since the last run) reads as absent to exists(), and the
        # recreate would die FileExistsError (ADVICE r9) — drop stale
        # links and relink
        if os.path.lexists(dst_path) and not os.path.exists(dst_path):
            os.unlink(dst_path)
        if not os.path.lexists(dst_path):
            os.symlink(src_path, dst_path)

    def release() -> None:
        # same per-measurement storage reset as bench.py: operator
        # persists/checkpoints from a prior query must not distort the
        # next measurement
        spark.catalog.clearCache()
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist(False)

    for name in probed:
        fn = QUERIES[name]
        fn(spark, SRC).count()  # warm the plan shape
        release()
        t0 = time.perf_counter()
        base_n = fn(spark, SRC).count()
        t_base = time.perf_counter() - t0
        release()
        t0 = time.perf_counter()
        hot_n = fn(spark, DST).count()
        t_hot = time.perf_counter() - t0
        print(
            f"{name}: uniform {t_base:.2f}s ({base_n} rows) -> "
            f"hot-key {t_hot:.2f}s ({hot_n} rows), wall x{t_hot / t_base:.1f}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
