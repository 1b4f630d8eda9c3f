"""Orchestration: multi-table / multi-database runs (SURVEY §2.14).

The reference fans out one OS process per database, capped at cpu_count
(/root/reference/main.py:170-190), and logs per-phase wall times
(main.py:73-110). On Spark the cluster scheduler owns parallelism: tables
run as concurrent JOBS from a driver-side thread pool into FAIR scheduler
pools, and every stage's parallelism comes from partitioning. The phase
timer reproduces the reference's logging discipline so bench runs emit
comparable stage breakdowns (BASELINE.md)."""

from __future__ import annotations

import time
from collections.abc import Callable, Iterable
from concurrent.futures import ThreadPoolExecutor
from contextlib import contextmanager
from typing import Any

from pyspark.sql import SparkSession


class PhaseTimer:
    """Per-phase wall-clock log (reference: migration_logger writes
    'Schema generation took Xs' etc., main.py:73-110)."""

    def __init__(self) -> None:
        self.phases: dict[str, float] = {}

    @contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.phases[name] = round(time.perf_counter() - t0, 3)

    def report(self) -> dict[str, float]:
        return dict(self.phases)


def run_concurrent(
    spark: SparkSession,
    jobs: Iterable[tuple[str, Callable[[], Any]]],
    max_parallel: int = 4,
    pool: str = "migration",
) -> dict[str, Any]:
    """Run independent per-table actions as concurrent Spark jobs.

    Driver threads only dispatch; executors do the work. FAIR pools keep
    one giant table from starving the small ones (the Spark analogue of
    the reference's per-db process pool, minus the per-process JVM cost).
    """
    spark.sparkContext.setLocalProperty("spark.scheduler.pool", pool)
    results: dict[str, Any] = {}

    def run(name: str, fn: Callable[[], Any]) -> None:
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", pool)
        results[name] = fn()

    with ThreadPoolExecutor(max_workers=max_parallel) as ex:
        futures = {ex.submit(run, n, f): n for n, f in jobs}
        for fut in futures:
            fut.result()  # propagate failures with their table name context
    return results
