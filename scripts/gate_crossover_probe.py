"""Driver-tail vs distributed-tail crossover probe (r18, VERDICT r17 #5).

connected_components_incremental picks its execution path by a COUNTED
batch size (driver_threshold): at or below the gate the batch-bounded
tail (collect + CPython union-find + broadcast relabel) runs in the
driver; above it the all-DataFrame tail runs. r17 shipped the gate at a
1e6 constant without measuring where the CPython loop actually loses to
the 32-core path. This probe times BOTH paths on synthetic batches of
10^3 / 10^4 / 10^5 / 10^6 pairs against a corpus map sized 2x the batch,
asserts the outputs identical, and prints the table the gate constant
should cite.

Synthetic shape: corpus docs 0..2N-1 clustered in pairs (2i ~ 2i+1), new
pairs bridge (2i+1, 2i+2) for even i — every new pair merges two
standing clusters, so the contraction graph is non-trivial at every
scale. Deterministic, no randomness.

Usage: python scripts/gate_crossover_probe.py [--sizes 1000,10000,...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mysql2psql_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1000,10000,100000,1000000")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    spark = get_spark(app_name="gate_crossover_probe")
    from pyspark.sql import functions as F

    from mysql2psql_spark.operators.dedup import connected_components_incremental
    from mysql2psql_spark.operators.materialize import materialize, unmaterialize

    # warm codegen + python workers once
    spark.range(1000).groupBy((F.col("id") % 7).alias("k")).count().collect()

    print(f"{'n_pairs':>9s} {'rep':>3s} {'driver_s':>9s} {'dist_s':>9s}")
    for n in sizes:
        # corpus map: docs 0..2n-1, cluster_id = even member of the pair
        cmap = materialize(
            spark.range(2 * n).select(
                F.col("id").alias("doc_id"),
                (F.col("id") - (F.col("id") % 2)).alias("cluster_id"),
            )
        )
        cmap.count()
        # new pairs: (2i+1, 2i+2) for i in 0..n-1 — each merges clusters
        # 2i and 2i+2 (chains of merges across the corpus)
        new_pairs = materialize(
            spark.range(n).select(
                (F.col("id") * 2 + 1).alias("doc_a"),
                (F.col("id") * 2 + 2).alias("doc_b"),
            )
        )
        new_pairs.count()

        for rep in range(args.reps):
            t0 = time.perf_counter()
            drv = connected_components_incremental(
                cmap, new_pairs, driver_threshold=10**12
            )
            n_drv = drv.count()
            t_drv = time.perf_counter() - t0

            t0 = time.perf_counter()
            dist = connected_components_incremental(
                cmap, new_pairs, driver_threshold=0
            )
            n_dist = dist.count()
            t_dist = time.perf_counter() - t0

            print(
                f"{n:9d} {rep:3d} {t_drv:9.3f} {t_dist:9.3f}",
                flush=True,
            )
            if rep == 0:
                # identity check once per size (collect is 2n rows; cap
                # the exact comparison at 2e5 rows, else compare
                # count + checksum). NOTE (r18 probe finding): the
                # distributed tail's contraction solve is
                # connected_components, whose min-label iteration is
                # capped at max_iter=25 — exact for its documented
                # near-dup-graph domain (small-diameter components) but
                # SILENTLY TRUNCATED on an adversarial high-diameter
                # graph; this probe's n=1e6 case is a diameter-1M merge
                # CHAIN, so expect a reported divergence there (the
                # driver union-find is exact at any diameter).
                if n <= 100_000:
                    a = sorted(map(tuple, drv.collect()))
                    b = sorted(map(tuple, dist.collect()))
                    print(f"# identity n={n}: {'OK' if a == b else 'DIVERGED'}")
                else:
                    diff = (
                        drv.alias("a")
                        .join(
                            dist.alias("b"),
                            F.col("a.doc_id") == F.col("b.doc_id"),
                            "full_outer",
                        )
                        .filter(
                            F.col("a.cluster_id").isNull()
                            | F.col("b.cluster_id").isNull()
                            | (F.col("a.cluster_id") != F.col("b.cluster_id"))
                        )
                        .count()
                    )
                    print(
                        f"# identity n={n}: "
                        f"{'OK' if diff == 0 else f'DIVERGED rows={diff}'}"
                    )
            spark.catalog.clearCache()
            # re-seat the shared inputs freed by clearCache
            cmap = materialize(cmap)
            cmap.count()
            new_pairs = materialize(new_pairs)
            new_pairs.count()
        unmaterialize(cmap)
        unmaterialize(new_pairs)
    spark.stop()


if __name__ == "__main__":
    main()
