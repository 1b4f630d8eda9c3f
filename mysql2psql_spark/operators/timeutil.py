"""Epoch-second extraction that survives TIMESTAMP vs TIMESTAMP_NTZ.

PySpark 4.x infers parquet timestamps written with ``isAdjustedToUTC=false``
as ``TIMESTAMP_NTZ`` (conf ``spark.sql.parquet.inferTimestampNTZ.enabled``,
default true), and ``CAST(TIMESTAMP_NTZ AS BIGINT)`` is not a legal cast
(DATATYPE_MISMATCH.CAST_WITHOUT_SUGGESTION). Every epoch computation in the
engine therefore routes through :func:`epoch_of`, which branches on the
source column's resolved dtype:

- ``TIMESTAMP`` (LTZ): ``cast("long")`` — the instant is absolute, so the
  result is session-timezone-independent.
- ``TIMESTAMP_NTZ``: ``timestamp_diff('SECOND', TIMESTAMP_NTZ '1970-01-01',
  col)`` — computed entirely in naive-clock space, so it is also
  session-timezone-independent and matches DuckDB's ``EPOCH(ts)`` on the
  same naive value (the oracle treats naive timestamps as-if-UTC).

Both branches floor fractional seconds for post-1970 values, matching the
oracle's ``CAST(FLOOR(EPOCH(ts)) AS BIGINT)``. (``timestamp_diff`` truncates
toward zero, which equals floor for the post-1970 data this engine handles;
pre-1970 NTZ values would round toward zero instead — documented limit.)

Never rely on the session conf instead of this helper: the correctness
driver runs queries under its own ``SparkSession``, so query code cannot
assume ``inferTimestampNTZ`` or the session timezone were pinned by
``mysql2psql_spark.session.get_spark``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DateType, TimestampNTZType

_EPOCH_NTZ = "1970-01-01 00:00:00"


def _as_col(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _ntz_epoch(c: Column) -> Column:
    # naive-clock arithmetic: session-timezone-independent, matches
    # DuckDB's EPOCH() on the same naive value
    return F.timestamp_diff("SECOND", F.lit(_EPOCH_NTZ).cast("timestamp_ntz"), c)


def is_ntz(df: DataFrame, colname: str) -> bool:
    """True iff ``df[colname]`` resolved as TIMESTAMP_NTZ."""
    return isinstance(df.schema[colname].dataType, TimestampNTZType)


def ts_family(df: DataFrame, colname: str) -> str:
    """``"naive"`` for TIMESTAMP_NTZ / DATE (wall-clock values, no zone),
    ``"instant"`` for TIMESTAMP (LTZ, an absolute point in time).

    Operators that combine two timestamp columns (range joins, as-of
    joins) must not mix the families: epoch arithmetic on a naive column
    is wall-clock math while on an instant column it is absolute-time
    math, and the two disagree by the session-timezone offset under any
    non-UTC session. Callers align families first (cast the lone instant
    side to ``timestamp_ntz``) or assert they already match."""
    return "naive" if isinstance(df.schema[colname].dataType, (TimestampNTZType, DateType)) else "instant"


def epoch_seconds(col: Column | str, *, ntz: bool) -> Column:
    """Epoch seconds (BIGINT, floored) for a timestamp column whose
    NTZ-ness is already known. Prefer :func:`epoch_of` which derives
    the branch from the source DataFrame (and also handles DATE)."""
    c = _as_col(col)
    if ntz:
        return _ntz_epoch(c)
    return c.cast("long")


def epoch_of(df: DataFrame, source_col: str = "ts") -> Callable[[Column | str], Column]:
    """Bind the dtype branch once per source frame; the returned function
    converts any column *derived from* ``source_col`` (window starts,
    lag/min/max of it, renamed copies) to epoch seconds — derived columns
    always inherit the source's type family.

    DATE columns route through TIMESTAMP_NTZ (midnight, naive) — also
    session-timezone-independent, and equal to DuckDB's ``EPOCH(d)``."""
    dt = df.schema[source_col].dataType
    if isinstance(dt, TimestampNTZType):
        return lambda col: _ntz_epoch(_as_col(col))
    if isinstance(dt, DateType):
        return lambda col: _ntz_epoch(_as_col(col).cast("timestamp_ntz"))
    return lambda col: _as_col(col).cast("long")
