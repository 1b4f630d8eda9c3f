"""Dtype parity between every oracle's DuckDB result frame and the Spark
query's schema.

Three rounds in a row, an otherwise value-identical query went red at the
driver because DuckDB typed an integral expression HUGEINT (``SUM`` of an
integral column, and anything derived from it) and pandas rendered it
``3.0`` where Spark's BIGINT rendered ``3`` — so the driver's value hash
diverged (r2 ``stream_sessionize``, r3 ``events_session_stats``, r4
``text_pack_sequences``).  This test retires the class: it executes all
registered oracles in DuckDB and checks that every column's pandas dtype
*kind* is render-compatible with the Spark query's schema.  An integral
Spark column must come back as an integer dtype (not float, not object),
a fractional Spark column as float, and vice versa — because the driver's
hash compares *rendered* values, not logical ones.

Only Spark schema analysis is needed (no jobs run), so this is cheap and
runs at sf0.001.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from mysql2psql_spark.queries import ORACLE, QUERIES
from tests.conftest import SF_DIR

SMALL_SCHEMA = SF_DIR.rstrip("/").rsplit("/", 1)[-1].replace(".", "_")

INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
FRACTIONAL = (T.FloatType, T.DoubleType)


def _expected_kinds(dt: T.DataType) -> str:
    """pandas dtype kinds that render identically to this Spark type."""
    if isinstance(dt, INTEGRAL):
        return "iu"
    if isinstance(dt, FRACTIONAL):
        return "f"
    if isinstance(dt, T.BooleanType):
        return "b"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "M"
    # strings, dates, arrays, maps, decimals all arrive as object on at
    # least one side; rendering parity for those is covered by the full
    # differential test (test_oracle.py), not dtype kinds.
    return "OiufbM"


def test_value_hash_is_render_sensitive():
    """driver_check's hash must go red on a HUGEINT-typed oracle column
    even when values are numerically identical (the driver's gate does)."""
    import pandas as pd

    from scripts.driver_check import value_hash

    ints = pd.DataFrame({"bucket": pd.array([3, 4], dtype="int64")})
    floats = pd.DataFrame({"bucket": pd.array([3.0, 4.0], dtype="float64")})
    assert value_hash(ints) != value_hash(floats)
    assert value_hash(ints) == value_hash(ints.copy())


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_dtype_matches_spark_schema(name, spark, duck):
    schema = QUERIES[name](spark, SF_DIR).schema
    duck.execute(f"USE {SMALL_SCHEMA}")
    want = duck.execute(ORACLE[name]).df()
    spark_types = {f.name: f.dataType for f in schema.fields}
    assert sorted(want.columns) == sorted(spark_types), name
    for col in want.columns:
        kind = want[col].dtype.kind
        allowed = _expected_kinds(spark_types[col])
        if kind in allowed:
            continue
        # an all-null column can surface as object/float regardless of the
        # declared type; rendering is 'None'/'NaN' on both sides then
        if want[col].isna().all():
            continue
        # a null-bearing integral column promotes to float64 in pandas on
        # BOTH sides (Spark's toPandas does the same), so rendering still
        # agrees — e.g. f9_fk_zero_to_null's NULLified FK (driver-green r2)
        if kind == "f" and "i" in allowed and want[col].isna().any():
            continue
        raise AssertionError(
            f"{name}.{col}: oracle dtype {want[col].dtype} (kind {kind!r}) "
            f"does not render-match Spark type {spark_types[col].simpleString()} "
            f"(expected kind in {allowed!r}) — the driver's value hash will "
            f"diverge even when values are identical (HUGEINT class)"
        )
