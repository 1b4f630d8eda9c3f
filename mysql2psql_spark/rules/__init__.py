"""Rule engine: the reference's declarative JSON rules compiled to Spark.

The reference's "query language" is three JSON rule files applied by
RuleHandler (/root/reference/libs/RuleHandler.py) via dict mutation plus a
per-row function dispatch (/root/reference/libs/PsqlParser.py:200-214).
Here the same rule formats compile to per-table plans of Column
expressions — Catalyst-optimizable, no row loops.
"""

from mysql2psql_spark.rules.dump_functions import (
    DUMP_FUNCTIONS,
    convert_str_boolean,
    default_date,
    default_datetime,
    make_it_empty,
    make_it_time,
    ref_to_nullable,
)

__all__ = [
    "DUMP_FUNCTIONS",
    "convert_str_boolean",
    "default_date",
    "default_datetime",
    "make_it_empty",
    "make_it_time",
    "ref_to_nullable",
]
