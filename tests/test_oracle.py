"""Differential test mirroring the driver's correctness gate: every
registered query runs on Spark and on DuckDB (oracle SQL) at sf0.01; row
count, column names, and values (order-insensitive, exact) must match."""

from __future__ import annotations

import pandas as pd
import pytest

from mysql2psql_spark.queries import ORACLE, QUERIES
from tests.conftest import SF_DIR_ORACLE

ORACLE_SCHEMA = SF_DIR_ORACLE.rstrip("/").rsplit("/", 1)[-1].replace(".", "_")


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            # unify None/NaN representation for sorting
            df[c] = df[c].where(pd.notna(df[c]), None)
    df = df.sort_values(by=list(df.columns), na_position="last").reset_index(drop=True)
    return df


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    spark_df = QUERIES[name](spark, SF_DIR_ORACLE)
    got = spark_df.toPandas()
    if name not in ORACLE:
        # rows-only check (non-SQL-expressible operator)
        assert got is not None
        return
    duck.execute(f"USE {ORACLE_SCHEMA}")
    want = duck.execute(ORACLE[name]).df()
    assert len(got) == len(want), f"{name}: rows {len(got)} != oracle {len(want)}"
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: columns {sorted(got.columns)} != {sorted(want.columns)}"
    )
    g, w = _normalize(got), _normalize(want)
    try:
        pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=True)
    except AssertionError as e:
        diff_preview = pd.concat({"spark": g.head(5), "duckdb": w.head(5)}, axis=1)
        raise AssertionError(f"{name}: value mismatch\n{diff_preview}\n{e}") from e


def test_entry_smoke(spark):
    import __spark_entry__ as mod

    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema is not None


def test_every_query_has_registry_consistency():
    for name in ORACLE:
        assert name in QUERIES, f"oracle {name} has no spark query"
