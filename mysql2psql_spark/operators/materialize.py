"""Shared multi-consumer materialization helper.

Spark's ReusedExchange only dedupes work BELOW an exchange boundary; an
aggregation or mapInPandas output consumed from several subtrees sits
ABOVE its last exchange, so without materialization the producing
pipeline re-executes once per consumer (measured: 4 FileScans + 4
shingle Generates in the sf0.1 ngram-dedup plan before this helper).

``materialize`` is a lazy ``localCheckpoint``: the frame's partitions
persist executor-local (memory-and-disk) at first use, lineage is
truncated, every other consumer reads the stored partitions, and no
bytes travel to the driver. At 100 TB the checkpoint is sized by the
frame itself (e.g. one array row per doc), vs. re-scanning the corpus
per consumer without it.

Caveats (and why they are accepted):

- localCheckpoint storage is NON-RELIABLE: losing an executor (crash or
  dynamic-allocation decommission) loses its partitions and fails the
  job, because lineage was truncated. On a static-allocation batch
  cluster (this engine's target) that equals ordinary task-failure
  semantics at the job level; under aggressive dynamic allocation,
  replace with ``df.persist(StorageLevel.MEMORY_AND_DISK)`` +
  an explicit action — persist keeps lineage so lost partitions
  recompute instead of failing the job.
- Checkpointed RDDs hold executor memory/disk until the session ends.
  Operators that are called repeatedly in one long-lived session should
  release them via :func:`unmaterialize` once the result has been
  consumed (the query-per-call pattern of this engine's bench/driver
  makes per-call accumulation a non-issue: each checkpoint is a few MB
  per 100k docs and the session is per-run).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialize(df: DataFrame) -> DataFrame:
    """Compute a multiply-consumed frame ONCE (lazy localCheckpoint)."""
    return df.localCheckpoint(eager=False)


def unmaterialize(df: DataFrame) -> None:
    """Release a frame returned by :func:`materialize` (best-effort).

    Frees the executor-side storage of the checkpointed RDD. Safe to
    call after every consumer has finished; a later re-use of the frame
    would fail (lineage is gone), so only call on operator-internal
    frames that do not escape."""
    try:
        df.rdd.unpersist(False)
    except Exception:
        # never let cleanup break the query path (e.g. the checkpoint
        # was never triggered because no consumer ran)
        pass
