"""ORC source + sink — the second columnar interchange format Spark
ships natively (no extra packages). Parquet remains the engine's
primary layout; ORC matters when the surrounding ecosystem is
Hive/Trino-flavored, and it carries the same scan-side virtues the
100 TB posture depends on: column pruning, predicate pushdown into
stripe/row-group indexes, and splittable files. The reader is
schema-first like the CSV/JSONL halves (inference over 100 TB costs a
second pass); writes go through the same layout operators
(`operators/layout.py`) as parquet writes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def write_orc(df: DataFrame, path: str, num_files: int | None = None) -> None:
    """Write ``df`` as ORC (zlib default). ``num_files`` coalesces small
    dimension tables; omit for corpus-sized frames."""
    out = df.coalesce(num_files) if num_files else df
    out.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    """Read an ORC directory/file. Pass ``schema`` for the schema-first
    contract (column subsets prune at the stripe level); omit it only
    for exploratory reads where the footer scan is acceptable."""
    reader = spark.read.schema(schema) if schema is not None else spark.read
    return reader.orc(path)
