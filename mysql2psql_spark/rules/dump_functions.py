"""Value-conversion functions (the reference's scalar-UDF surface).

The reference ships these as row-at-a-time Python functions in
/root/reference/dumperAuxFuncs.py, dispatched per column by
rules/mysql_raw_dump.json and applied inside the per-row dump loop
(/root/reference/libs/PsqlParser.py:211-214). Every one of them is
expressible as a pure Column expression, so the whole surface stays inside
whole-stage codegen — no Python in the hot path, at any scale.

Semantics are pinned 1:1 (see tests/test_dump_functions.py):

- convertStrBoolean (dumperAuxFuncs.py:8-11): int(v) truthiness; None,
  0, '0', and unparseable strings are False.
- defaultDate / notNullableDate (dumperAuxFuncs.py:13-21): MySQL
  zero-dates ('0000-…') and NULL -> NULL when the column is nullable,
  '1900-01-01' when NOT NULL.
- notNullableDatetime (dumperAuxFuncs.py:24-27): same with the
  '1900-01-01 00:00:00' fallback.
- refToNullable (dumperAuxFuncs.py:29-32): FK value 0/'0' -> NULL
  ("0 means no parent").
- makeItEmpty (dumperAuxFuncs.py:34-36): blob columns are not migrated;
  NULL when nullable else ''.
- makeItTime (dumperAuxFuncs.py:38-41): keep iff it looks like HH:MM
  (regex at dumperAuxFuncs.py:6), else NULL / '00:00'.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

TIME_RE = r"^\d\d:\d\d"


def convert_str_boolean(col: Column) -> Column:
    # try_cast mirrors the reference's swallowed int() exception branch.
    # BIGINT, not INT: Python's int() is arbitrary-precision, so values
    # past 2^31 (e.g. '2200000000') must still coerce truthy (found by
    # the hypothesis property test against the reference model).
    return F.coalesce(col.try_cast("bigint") != F.lit(0), F.lit(False))


def default_date(col: Column, nullable: bool = True) -> Column:
    s = col.cast("string")
    fixed = F.when(s.isNull() | s.startswith("0000"), F.lit(None)).otherwise(s)
    return fixed if nullable else F.coalesce(fixed, F.lit("1900-01-01"))


def default_datetime(col: Column, nullable: bool = True) -> Column:
    s = col.cast("string")
    fixed = F.when(s.isNull() | s.startswith("0000"), F.lit(None)).otherwise(s)
    return fixed if nullable else F.coalesce(fixed, F.lit("1900-01-01 00:00:00"))


def ref_to_nullable(col: Column) -> Column:
    return F.when(col.cast("string") == "0", F.lit(None)).otherwise(col)


def make_it_empty(col: Column, nullable: bool = True) -> Column:
    return F.lit(None).cast("string") if nullable else F.lit("")


def make_it_time(col: Column, nullable: bool = True) -> Column:
    kept = F.when(col.rlike(TIME_RE), col)
    return kept.otherwise(F.lit(None)) if nullable else kept.otherwise(F.lit("00:00"))


# Dispatch registry: name -> builder, mirroring the getattr() reflection at
# /root/reference/libs/PsqlParser.py:214 but resolving to expression
# builders instead of row functions.
DUMP_FUNCTIONS: dict[str, Callable[..., Column]] = {
    # every builder takes (col, nullable=...) — the date/datetime methods
    # branch on the column's nullability inside, like the reference's
    # f(value, col_attrs) signature (dumperAuxFuncs.py:13-27)
    "convertStrBoolean": lambda c, nullable=True: convert_str_boolean(c),
    "defaultDate": default_date,
    "notNullableDate": default_date,
    "notNullableDatetime": default_datetime,
    "refToNullable": lambda c, nullable=True: ref_to_nullable(c) if nullable else c,
    "makeItEmpty": make_it_empty,
    "makeItTime": make_it_time,
}
