"""CSV source for the reference bulk-load dialect — the read half of
sinks/csv_sink.py, so a migration can be driven in BOTH directions
(extract -> CSV -> load, or re-ingest a previously dumped table).

Dialect (reference `\\copy` options, /root/reference/libs/
PsqlParser.py:134-137): quote=', escaped by doubling, delimiter=,,
literal NULL for SQL NULLs, no header. An explicit schema is required —
the reference's loads are always schema-first (DDL runs before data),
and schema inference would force a second pass over 100 TB of text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_reference_csv(
    spark: SparkSession, path: str, schema: T.StructType, strict: bool = True
) -> DataFrame:
    """Read a reference-dialect CSV directory (or file) with the given
    schema. ``strict=True`` uses FAILFAST so a malformed row aborts the
    load (the \\copy behavior); ``strict=False`` uses PERMISSIVE and
    routes broken rows to the ``_corrupt_record`` column for triage
    instead of killing a multi-hour load."""
    reader = (
        spark.read.schema(
            schema
            if strict
            else T.StructType(
                [*schema.fields, T.StructField("_corrupt_record", T.StringType())]
            )
        )
        .option("quote", "'")
        .option("escape", "'")
        .option("nullValue", "NULL")
        .option("delimiter", ",")
        .option("mode", "FAILFAST" if strict else "PERMISSIVE")
    )
    return reader.csv(path)
