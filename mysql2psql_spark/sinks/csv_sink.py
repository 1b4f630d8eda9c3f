"""CSV sink with the reference's bulk-load dialect.

The reference writes one CSV per table with quote=', delimiter=,, and the
literal NULL for SQL NULLs, then loads via `\\copy ... WITH (FORMAT CSV,
QUOTE '''', DELIMITER ',', NULL 'NULL')` (/root/reference/libs/
PsqlParser.py:122-146, format string 134-137). Spark's csv writer covers
the dialect natively — and writes it in parallel, one file per partition,
which is the 100 TB-safe shape (the single-file reference layout is a
coalesce(1) away when a sink really needs it)."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def write_reference_csv(df: DataFrame, path: str, single_file: bool = False) -> str:
    """Write reference-dialect CSV; returns the matching \\copy command(s)
    (the psql_data.sql manifest line, PsqlParser.py:136-137).

    psql's \\copy reads FILES, not directories, so the manifest targets
    the actual part file(s) inside Spark's output directory: one line for
    the single part when ``single_file=True`` (the reference's one-CSV-
    per-table layout), else one \\copy line per part file — same rows,
    loadable in parallel psql sessions at scale."""
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
    parts = sorted(
        str(p) for p in Path(path).glob("part-*.csv")
    ) or [path]  # non-local filesystems: fall back to the directory URI
    return "\n".join(
        f"\\copy \"{table}\" ({cols}) FROM '{p}' "
        "WITH (FORMAT CSV, QUOTE '''', DELIMITER ',', NULL 'NULL');"
        for p in parts
    )
