"""Session-age contamination probe for the driver-bench elevation of
``text_unigram_surprisal`` (VERDICT r9 what's-wrong #1).

Two consecutive driver artifacts read the query at ~4 s (12.6x its
0.325 s r7 floor) at its fixed late position (~154th of 170, right after
``text_duplicate_spans``), while committed interleaved medians in a
short session read 0.68 s — untouched code, two reproducible but
contradictory numbers. The hypothesis is positional/session-age state in
the one long bench session (ContextCleaner debt, codegen-cache eviction,
accumulated broadcast/shuffle bookkeeping), not ambient weather.

This probe REPLAYS the bench's actual context in one session:

  warmup   — bench.py's exact warmup ladder (footers, codegen, Python
             workers, full HEADLINE pass at sf0.001)
  FRESH    — target + control medians right after warmup (the
             interleave-style measurement)
  prefix   — every HEADLINE query before the target at sf0.1,
             repeat x each, bench-style release between reps (the
             session is now the age the driver measures the target at)
  AGED     — target + control medians in position
  AGED_GC  — same, with a System.gc() barrier before each rep (if this
             recovers the FRESH number, the mechanism is GC-reclaimable
             driver state and bench.py's release step needs the barrier)

Ambient normalization: the control (s4_scan_projection) is measured at
every phase; loadavg is recorded per phase. Compare RATIOS, not raw
seconds (measurement-discipline memory: single-run seconds on this host
drift up to 3x under ambient load).

Usage: python scripts/session_age_probe.py   (~7 min at sf0.1)
  PROBE_TARGET / PROBE_CONTROL / PROBE_REPS / SPARK_GRAFT_SF_DIR override.
Writes PROBE_SESSION_AGE.json at the repo root (committed artifact).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE
from mysql2psql_spark.queries import QUERIES
from mysql2psql_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM = os.environ.get("SPARK_GRAFT_WARMUP_SF_DIR", "/root/testdata/sf0.001")
TARGET = os.environ.get("PROBE_TARGET", "text_unigram_surprisal")
CONTROL = os.environ.get("PROBE_CONTROL", "s4_scan_projection")
REPS = int(os.environ.get("PROBE_REPS", "5"))
BENCH_REPEAT = int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "3"))


def main() -> None:
    spark = get_spark(app_name="session_age_probe")
    spark.sparkContext.setLogLevel("ERROR")

    def release() -> None:
        spark.catalog.clearCache()
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist(False)

    def run(name: str, gc_barrier: bool = False) -> float:
        release()
        if gc_barrier:
            spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        QUERIES[name](spark, SF).count()
        return round(time.perf_counter() - t0, 3)

    def phase(tag: str, gc_barrier: bool = False) -> dict:
        t = [run(TARGET, gc_barrier) for _ in range(REPS)]
        c = [run(CONTROL, gc_barrier) for _ in range(3)]
        row = {
            "target": t,
            "target_median": round(statistics.median(t), 3),
            "control": c,
            "control_median": round(statistics.median(c), 3),
            "loadavg": os.getloadavg(),
        }
        print(f"# {tag}: target {row['target_median']}s {t} | "
              f"control {row['control_median']}s | load {row['loadavg']}",
              file=sys.stderr, flush=True)
        return row

    # --- bench.py's exact warmup ladder ---------------------------------
    from pyspark.sql import functions as F

    spark.read.parquet(f"{SF}/lineitem.parquet").count()
    small = spark.range(1000).select((F.col("id") % 10).alias("k"), F.col("id").alias("v"))
    dim = spark.range(10).select(F.col("id").alias("k"))
    small.join(dim.hint("broadcast"), "k").groupBy("k").agg(F.sum("v")).collect()

    def _ident(batches):
        yield from batches

    spark.range(64).repartition(32).mapInPandas(_ident, "id long").count()
    for name in HEADLINE:
        fn = QUERIES.get(name)
        if fn is not None:
            try:
                fn(spark, WARM).count()
            except Exception as exc:
                print(f"# warmup {name} failed: {exc}", file=sys.stderr)

    out: dict = {
        "target_name": TARGET, "control_name": CONTROL, "sf_dir": SF,
        "bench_repeat": BENCH_REPEAT, "reps": REPS,
    }
    out["fresh"] = phase("FRESH")

    # --- replay the bench prefix: every HEADLINE query before the target,
    # BENCH_REPEAT runs each with the bench's own release step ------------
    idx = HEADLINE.index(TARGET)
    t0 = time.perf_counter()
    executed = 0
    for name in HEADLINE[:idx]:
        fn = QUERIES.get(name)
        if fn is None:
            continue
        for _ in range(BENCH_REPEAT):
            release()
            try:
                fn(spark, SF).count()
            except Exception as exc:
                print(f"# prefix {name} failed: {exc}", file=sys.stderr)
                break
            executed += 1
    out["prefix"] = {
        "n_queries": idx, "n_executions": executed,
        "wall_sec": round(time.perf_counter() - t0, 1),
        "loadavg": os.getloadavg(),
    }
    print(f"# prefix replayed: {executed} executions in "
          f"{out['prefix']['wall_sec']}s", file=sys.stderr, flush=True)

    out["aged"] = phase("AGED")
    out["aged_gc"] = phase("AGED_GC", gc_barrier=True)
    # does recovery (if any) persist once the barrier is removed again?
    out["aged_post_gc"] = phase("AGED_POST_GC")

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PROBE_SESSION_AGE.json"), "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(json.dumps({k: v for k, v in out.items() if k != "prefix"} | {
        "prefix_wall": out["prefix"]["wall_sec"]}))
    spark.stop()


if __name__ == "__main__":
    main()
