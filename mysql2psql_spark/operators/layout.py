"""Data-layout operators: Z-order (Morton) clustering for scan pruning.

The reference migrates tables in whatever physical order MySQL hands it
(libs/MysqlParser.py:214-227 — a straight SELECT with no ORDER BY); at
100 TB the physical layout of the written files IS the dominant scan
cost, because parquet row-group min/max statistics only prune when rows
that are close in the filter dimensions are close on disk. Sorting by a
single column clusters one dimension and destroys the other; a Z-order
(Morton) key interleaves the bits of several dimensions so that rows
close in ANY of them land in the same neighborhood of the curve — file
min/max ranges stay narrow in every interleaved dimension at once, and
multi-dimensional point/range filters skip most files.

Execution shape: the key is a pure JVM-side bit expression (shift/and/or
— whole-stage codegen, no UDF), and the layout is one
`repartitionByRange` exchange on the key followed by a partition-local
sort — the same cost as any global sort-write, which a bulk migration
pays anyway.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable
from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def zorder_key(x: Column, y: Column, bits: int = 10) -> Column:
    """Morton-interleave the low `bits` bits of two non-negative integer
    columns into a single BIGINT Z-value (x occupies even bit positions,
    y odd). Callers bound the inputs (e.g. `col.bitwiseAND(F.lit(1023))`
    or a rank/bucket transform) so the curve covers the domain evenly;
    values beyond `bits` bits are masked off here for safety.
    """
    terms = []
    one = F.lit(1)
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(x, i).bitwiseAND(one), 2 * i))
        terms.append(F.shiftleft(F.shiftright(y, i).bitwiseAND(one), 2 * i + 1))
    return reduce(lambda a, b: a.bitwiseOR(b), terms).cast("bigint")


def zorder_key_sql(x: str, y: str, bits: int = 10) -> str:
    """The identical interleave as an ANSI-SQL expression (DuckDB/ANSI
    bit operators) — the oracle twin of `zorder_key`, generated from the
    same loop so the two can never drift."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def zorder_layout(df: DataFrame, zcol: Column, num_files: int) -> DataFrame:
    """Cluster `df` along the Z-curve: one range exchange on the Z-value
    (contiguous curve segments per output file, so each file's min/max
    box is a compact curve segment) + a partition-local sort that keeps
    row groups inside each file tight. Write the result with any sink;
    no extra shuffle is added beyond the one a sorted bulk write costs.
    """
    return df.repartitionByRange(num_files, zcol).sortWithinPartitions(zcol)


def compact_files(
    df: DataFrame,
    target_rows_per_file: int,
    cluster_by: Column | str | None = None,
) -> DataFrame:
    """Small-files compaction: repartition ``df`` so each output file
    holds ~``target_rows_per_file`` rows. The streaming ingest path
    (micro-batch appends) and over-parallel writes both leave thousands
    of KB-sized files whose per-file open/footer cost dominates scans at
    scale; periodic compaction is standard table maintenance.

    ``cluster_by`` preserves (or establishes) clustering while
    compacting: a range exchange + partition-local sort on the key, so
    compacting a table previously written via :func:`zorder_layout`
    keeps its min/max pruning — pass the same Z-value expression. The
    default (None) is a plain round-robin merge, appropriate only for
    tables with no clustering to protect.

    The sizing count costs one pass over ``df``; persist the input
    first (or read the row count from table statistics) when the
    source is expensive to re-scan — compaction jobs accept a planning
    pass, so this helper does not silently cache behind the caller's
    back. Pair the write with
    ``option("maxRecordsPerFile", target_rows_per_file)`` as a cap for
    skewed partitions.
    """
    n_rows = df.count()
    n_files = max(1, -(-n_rows // target_rows_per_file))
    if cluster_by is not None:
        key = F.col(cluster_by) if isinstance(cluster_by, str) else cluster_by
        return df.repartitionByRange(n_files, key).sortWithinPartitions(key)
    # unclustered merge: always a round-robin repartition. An earlier cut
    # used coalesce when narrowing, but (a) coalesce inserts no shuffle
    # boundary, so compacting an EXPENSIVE upstream pipeline to few files
    # computes that pipeline at n_files-way parallelism — nearly serially
    # for small targets — and (b) deciding "is this narrowing?" needs the
    # current partition count via df.rdd, a driver-side toRdd physical
    # planning pass (the same cost materialize.py documents). The
    # repartition shuffle moves only the rows being written — one pass of
    # the output — while keeping every upstream stage at full width.
    return df.repartition(n_files)


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
    fmt: str = "parquet",
    path: str | None = None,
) -> None:
    """Persist ``df`` as a BUCKETED table: rows hash-distributed into
    ``n_buckets`` files per partition by ``keys`` (and, with ``sort``,
    sorted by them inside each bucket).

    This is the co-located-join layout for 100 TB fact tables: two
    tables bucketed on the same keys with the same bucket count join
    with NO exchange on either side (and no sort, when both were
    written sorted) — Spark's scan reports the bucket spec as its
    output partitioning, so EnsureRequirements inserts nothing. A fact
    table that is joined on the same key by many downstream queries
    pays its distribution shuffle ONCE at write time instead of once
    per query; the reference's secondary indexes (SURVEY §2 D7,
    libs/PsqlParser.py:405-420) have exactly this role on the
    PostgreSQL side. Aggregations grouping by a superset of ``keys``
    are likewise exchange-free.

    Bucketing requires the table-catalog write path (``saveAsTable``;
    plain ``.parquet(path)`` silently drops the bucket spec — Spark
    refuses the combination instead). The bucket count is a layout
    contract: readers only get the exchange-free join between tables
    whose counts MATCH (or divide, with
    ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``), so fix it
    fleet-wide per key domain (pick ~(table size / 128 MB) at the
    LARGEST table that will join, and reuse that count everywhere).

    ``path`` pins the table data to an explicit location (external
    table) instead of the session warehouse — callers running under a
    DEFAULT-configured session (warehouse = ``$PWD/spark-warehouse``)
    pass a scratch path so layout experiments never litter the caller's
    working tree.
    """
    w = df.write.format(fmt).mode(mode).bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


# per-process scratch roots for external bucketed tables, keyed by the
# Spark applicationId so a process that cycles sessions gets a fresh root
# per session. mkdtemp (mode 0700, collision-free name) instead of a
# fixed /tmp path: a WORLD-SHARED fixed path let two concurrent sessions
# (parallel pytest + bench, or two driver rounds) each see
# tableExists()=False in their own session-scoped catalog and race
# mode=overwrite writes into the same directory — corrupted/partial
# reads — and a pre-placed directory/symlink at a predictable /tmp path
# is the classic insecure-tmp hazard (ADVICE r10, medium).
_SESSION_SCRATCH: dict[str, str] = {}


def _cleanup_scratch() -> None:
    """Best-effort removal of this process's scratch roots at interpreter
    exit — repeated driver/bench rounds must not accumulate table data
    under /tmp. Failure is fine (another process, already gone)."""
    import shutil

    for root in list(_SESSION_SCRATCH.values()):
        try:
            shutil.rmtree(root, ignore_errors=True)
        except Exception:
            pass
    _SESSION_SCRATCH.clear()


def session_scratch(spark: SparkSession) -> str:
    """Session-unique scratch directory for external-table data."""
    import atexit

    app = spark.sparkContext.applicationId
    root = _SESSION_SCRATCH.get(app)
    if root is None:
        if not _SESSION_SCRATCH:
            atexit.register(_cleanup_scratch)
        root = tempfile.mkdtemp(prefix="mysql2psql_spark_bucketed_")
        _SESSION_SCRATCH[app] = root
    return root


def derived_bucket_count(
    spark: SparkSession,
    est_bytes: int | None = None,
    target_bytes: int = 128 << 20,
) -> int:
    """The engine's bucket-count rule: ``max(session executor width,
    ceil(est_bytes / 128 MB))``.

    Two forces, measured r11: a bucketed SCAN locks downstream
    parallelism to its bucket count (triangles' intersect phase ran
    8-wide off an 8-bucket edge table — 2.34 vs 2.05 s at width), so the
    session's executor width is the FLOOR; and at 100 TB a bucket must
    stay near one task's working size, so ``est_bytes / 128 MB`` (the
    ``spark.sql.files.maxPartitionBytes`` default) takes over as soon as
    the table outgrows width x 128 MB. Callers without a size estimate
    omit ``est_bytes`` and get the width floor — correct for the
    session-scoped artifacts here (all << 128 MB/bucket at bench scale);
    an ingest pipeline maintaining the table passes its real size.
    Fleet rule unchanged: every table sharing a join key domain must use
    the SAME count (or a divisor with bucket coalescing enabled), so
    derive once per key domain at the LARGEST table and reuse."""
    width = max(int(spark.sparkContext.defaultParallelism), 1)
    if est_bytes is None:
        return width
    return max(width, -(-int(est_bytes) // int(target_bytes)))


def _catalog_bucket_spec(
    spark: SparkSession, table: str
) -> "tuple[int, list[str], list[str]]":
    """(num_buckets, bucket_columns, sort_columns) of an existing catalog
    table, via DESCRIBE FORMATTED (the stable public surface for bucket
    specs; the Catalog API does not expose them)."""
    desc = {
        r.col_name.strip(): (r.data_type or "").strip()
        for r in spark.sql(f"DESCRIBE FORMATTED {table}").collect()
    }
    try:
        n = int(desc.get("Num Buckets", ""))
    except ValueError:
        n = -1

    def _cols(field: str) -> list[str]:
        return [
            c.strip(" `")
            for c in desc.get(field, "").strip("[]").split(",")
            if c.strip(" `")
        ]

    return n, _cols("Bucket Columns"), _cols("Sort Columns")


def ensure_bucketed_table(
    spark: SparkSession,
    table: str,
    keys: list[str],
    n_buckets: int,
    build: Callable[[], DataFrame],
    sort: bool = True,
) -> DataFrame:
    """Write-once-per-session external bucketed table: the
    pay-the-distribution-shuffle-ONCE contract for any artifact several
    queries re-derive (the part co-order edge list, the o6 fact layout).
    The first call in a session builds + writes; every later call (and
    every later query in the same session) scans the bucketed files with
    the bucket spec as its output partitioning — groupBy/join on a
    superset of ``keys`` plans exchange-free. At 100 TB this IS the
    steady state: such artifacts are persisted tables maintained by the
    ingest pipeline, not per-query derivations.

    The build is repartitioned to ``n_buckets`` on ``keys`` before the
    write: repartition's hash and the bucket hash agree, so each write
    task holds exactly one bucket's rows and emits ONE file per bucket
    (without it, a w-way upstream shuffle writes up to w x n_buckets
    bucket fragments).

    Data lands under :func:`session_scratch` (mkdtemp — never a shared
    fixed path, never the caller's cwd warehouse); the catalog entry is
    session-scoped, so table name and data lifetime agree.
    """
    if not spark.catalog.tableExists(table):
        df = build().repartition(n_buckets, *[F.col(k) for k in keys])
        write_bucketed(
            df,
            table,
            keys,
            n_buckets,
            sort=sort,
            path=os.path.join(session_scratch(spark), table),
        )
    else:
        # Existence is keyed on the table NAME, so a second caller
        # passing the same name with a different spec would silently
        # read the first caller's data and layout (ADVICE r11). Validate
        # the catalog spec against the arguments and refuse a mismatch —
        # one DESCRIBE per re-entry, no data scan.
        have_n, have_keys, have_sort = _catalog_bucket_spec(spark, table)
        want_sort = list(keys) if sort else []
        if have_n != n_buckets or have_keys != list(keys) or have_sort != want_sort:
            raise ValueError(
                f"bucketed table {table!r} already exists in this session "
                f"with spec (keys={have_keys}, n_buckets={have_n}, "
                f"sort={have_sort}) != requested (keys={list(keys)}, "
                f"n_buckets={n_buckets}, sort={want_sort}); a caller relying "
                f"on in-bucket sortedness would otherwise silently get an "
                f"unsorted layout (wrong plan assumption, ADVICE r12) — "
                f"bucketed-table names are session-scoped contracts; use a "
                f"distinct name for a different layout."
            )
    return spark.table(table)
