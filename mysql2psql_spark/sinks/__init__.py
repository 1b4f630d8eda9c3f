"""Sinks: reference-dialect CSV, Parquet, DDL script generation (D1-D10)."""

from mysql2psql_spark.sinks.csv_sink import write_reference_csv
from mysql2psql_spark.sinks.ddl import (
    create_index_ddl,
    create_table_ddl,
    drop_table_ddl,
    fk_constraint_ddl,
    schema_preamble,
    sequence_ddl,
    view_ddl,
)

__all__ = [
    "write_reference_csv",
    "create_table_ddl",
    "drop_table_ddl",
    "create_index_ddl",
    "fk_constraint_ddl",
    "sequence_ddl",
    "view_ddl",
    "schema_preamble",
]
