"""Parquet source for the driver testdata catalog.

Full-table scan parity with the reference's ``get_table_raw_data``
(/root/reference/libs/MysqlParser.py:104-137), except the scan is columnar,
partitioned, and Catalyst pushes projections and predicates into the
Parquet reader (the reference hand-builds its SELECT list for the same
effect — SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Column pruning / filter pushdown is Catalyst's job —
    callers express the plan declaratively and the physical Parquet scan
    reads only what the plan needs.

    `events.ts` is TIMESTAMP(NANOS) parquet, which Spark 4 only reads via
    the nanosAsLong legacy conf; we normalize it back to TimestampType
    (microsecond precision — every engine query orders/buckets with an
    explicit unique tie-break, so the ns truncation is semantics-free).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integer division: ns epochs overflow double precision
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register temp views so operators can be written in SQL when clearer."""
    for n, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(n)
