"""Wedge-join hub-key probe for the link-prediction pair (VERDICT r13 #4).

The uniform 5x replica probe grows every customer's degree evenly, so no
wedge key ever dominates. This probe constructs the adversarial shape
directly: ONE customer rewired to ``--hub-degree-mult`` x its base
supplier-degree (default 100x — VERDICT r13 #4's ask). The supplier ids
are synthesized PAST the real supplier population (sc_pairs derives the
bipartite graph from lineitem x orders alone, so suppkeys are just
keys): rewiring to the real 1000 suppliers tops out at ~16x and its
C(1000,2) ~ 500k wedges vanish inside the ~12.5M-wedge corpus baseline
(measured flat, x0.8-0.9 — the first probe run's honest null result).
At 100x (6300 suppliers for the sf0.1 hub), the single key owes
C(6300,2) ~ 19.8M wedge rows — ~1.6x the entire corpus's uniform wedge
volume through ONE shuffle key.

Measured per query: pristine wall, hub wall uncapped (what AQE/salting
would still have to pay — the k^2 rows are owed, splitting them only
spreads the bill), and hub wall with ``codegree_cap`` engaged (the
high-degree-common discard: the hub never enters the wedge join).
Findings land in the README probe table + the two query docstrings.

Usage: python scripts/wedge_hub_probe.py [--cap 256]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mysql2psql_spark.session import get_spark

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = "/tmp/wedge_hub_probe"

PROBED = ["graph_jaccard_neighbors", "graph_adamic_adar"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cap", type=int, default=256)
    ap.add_argument("--hub-degree-mult", type=int, default=100)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from mysql2psql_spark.queries import QUERIES
    from mysql2psql_spark.sources import load_table

    spark = get_spark(app_name="wedge_hub_probe")
    spark.sparkContext.setLogLevel("ERROR")

    shutil.rmtree(DST, ignore_errors=True)
    os.makedirs(DST)
    for entry in os.listdir(SRC):
        if entry != "lineitem.parquet":
            os.symlink(os.path.join(SRC, entry), os.path.join(DST, entry))

    li = load_table(spark, SRC, "lineitem")
    orders = load_table(spark, SRC, "orders")
    # the hub: the smallest custkey's first order carries one synthetic
    # lineitem per synthesized supplier key — sc_pairs dedups (s, c), so
    # the hub customer's degree becomes exactly mult x its base degree
    hub_order = (
        orders.orderBy("o_custkey", "o_orderkey").limit(1).collect()[0]
    )
    base_deg = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("o_custkey") == hub_order["o_custkey"])
        .select("l_suppkey")
        .distinct()
        .count()
    )
    hub_deg = base_deg * args.hub_degree_mult
    template = li.limit(1).collect()[0].asDict()
    synth = spark.range(1, hub_deg + 1).select(
        *[
            F.col("id").cast("bigint").alias(c)
            if c == "l_suppkey"
            else F.lit(hub_order["o_orderkey"]).cast("bigint").alias(c)
            if c == "l_orderkey"
            else F.lit(template[c]).alias(c)
            for c in li.columns
        ]
    )
    li.unionByName(synth).write.mode("overwrite").parquet(
        f"{DST}/lineitem.parquet"
    )
    print(
        f"# hub: custkey {hub_order['o_custkey']} degree "
        f"{base_deg} -> {hub_deg} (x{args.hub_degree_mult}; "
        f"~{hub_deg * (hub_deg - 1) // 2:,} wedges through one key)",
        flush=True,
    )

    def release() -> None:
        spark.catalog.clearCache()
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist(False)

    for name in PROBED:
        fn = QUERIES[name]
        fn(spark, SRC).count()  # warm plan shape + SRC bucketed table
        release()
        t0 = time.perf_counter()
        base_n = fn(spark, SRC).count()
        t_base = time.perf_counter() - t0
        fn(spark, DST).count()  # pay the DST bucketed-table build once
        release()
        t0 = time.perf_counter()
        hub_n = fn(spark, DST).count()
        t_hub = time.perf_counter() - t0
        release()
        t0 = time.perf_counter()
        cap_n = fn(spark, DST, codegree_cap=args.cap).count()
        t_cap = time.perf_counter() - t0
        print(
            f"{name}: pristine {t_base:.2f}s ({base_n} rows) -> "
            f"hub {t_hub:.2f}s ({hub_n} rows, x{t_hub / t_base:.1f}) -> "
            f"capped({args.cap}) {t_cap:.2f}s ({cap_n} rows, "
            f"x{t_cap / t_base:.1f})",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
