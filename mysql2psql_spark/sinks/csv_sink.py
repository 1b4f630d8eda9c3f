"""CSV sink with the reference's bulk-load dialect.

The reference writes one CSV per table with quote=', delimiter=,, and the
literal NULL for SQL NULLs, then loads via `\\copy ... WITH (FORMAT CSV,
QUOTE '''', DELIMITER ',', NULL 'NULL')` (/root/reference/libs/
PsqlParser.py:122-146, format string 134-137). Spark's csv writer covers
the dialect natively — and writes it in parallel, one file per partition,
which is the 100 TB-safe shape (the single-file reference layout is a
coalesce(1) away when a sink really needs it)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def write_reference_csv(df: DataFrame, path: str, single_file: bool = False) -> str:
    """Write reference-dialect CSV; returns the matching \\copy command
    (the psql_data.sql manifest line, PsqlParser.py:136-137)."""
    # CSV is flat; the reference's world has no nested types, so our
    # extension columns (array/map/struct, e.g. embeddings) serialize as
    # JSON text — matching their varchar mapping in the introspected DDL
    out = df.select(
        *[
            F.to_json(f.name).alias(f.name)
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
            else F.col(f.name)
            for f in df.schema.fields
        ]
    )
    out = out.coalesce(1) if single_file else out
    (
        out.write.mode("overwrite")
        .option("quote", "'")
        .option("escape", "'")  # PG CSV doubles the quote char
        .option("nullValue", "NULL")
        .option("delimiter", ",")
        .csv(path)
    )
    cols = ", ".join(f'"{c}"' for c in df.columns)
    # files are written as tables/<t>.sql (reference naming); the \copy
    # targets the bare table name
    table = path.rstrip("/").rsplit("/", 1)[-1].removesuffix(".sql")
    return (
        f"\\copy \"{table}\" ({cols}) FROM '{path}' "
        "WITH (FORMAT CSV, QUOTE '''', DELIMITER ',', NULL 'NULL');"
    )
