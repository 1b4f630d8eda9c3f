"""Pinned regression tests for the TIMESTAMP_NTZ epoch handling.

PySpark 4.x resolves parquet timestamps written with isAdjustedToUTC=false
as TIMESTAMP_NTZ (spark.sql.parquet.inferTimestampNTZ.enabled defaults to
true), and CAST(TIMESTAMP_NTZ AS BIGINT) throws at analysis time — the
round-3 regression that broke every epoch-computing event query. These
tests pin the shared helper (operators/timeutil.py) under BOTH readings of
the same parquet bytes and under a non-UTC session timezone, so the
engine's epoch arithmetic can never silently depend on the driver's
session configuration again.
"""

from __future__ import annotations

import contextlib
import datetime as dt

import pytest
from pyspark.sql import functions as F

from mysql2psql_spark.operators.timeutil import epoch_of, epoch_seconds, is_ntz
from mysql2psql_spark.queries import QUERIES

NTZ_CONF = "spark.sql.parquet.inferTimestampNTZ.enabled"
TZ_CONF = "spark.sql.session.timeZone"


@contextlib.contextmanager
def _conf(spark, key: str, value: str):
    old = spark.conf.get(key)
    spark.conf.set(key, value)
    try:
        yield
    finally:
        spark.conf.set(key, old)


@pytest.fixture(scope="module")
def ts_fixture(tmp_path_factory):
    """Naive timestamps with fractional seconds, written by pyarrow with
    isAdjustedToUTC=false — the exact shape of the driver's events.ts.
    (Written by pyarrow, NOT Spark: Spark-written NTZ parquet carries a
    writer marker that pins the type and bypasses the infer conf, but the
    driver's testdata has no such marker.)"""
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = str(tmp_path_factory.mktemp("ntz") / "ts.parquet")
    stamps = [
        dt.datetime(2024, 1, 1, 0, 0, 0),
        dt.datetime(2024, 1, 1, 0, 0, 0, 999999),  # frac secs -> floor
        dt.datetime(2024, 3, 10, 7, 30, 0),  # inside a US DST jump
        dt.datetime(2024, 7, 4, 12, 34, 56, 500000),
    ]
    table = pa.table(
        {
            "id": pa.array([1, 2, 3, 4], pa.int64()),
            "ts": pa.array(stamps, pa.timestamp("us")),  # no tz => naive
        }
    )
    pq.write_table(table, path)
    return path


EXPECTED = {1: 1704067200, 2: 1704067200, 3: 1710055800, 4: 1720096496}


def _epochs(df):
    ep = epoch_of(df)
    return {r["id"]: r["e"] for r in df.select("id", ep("ts").alias("e")).collect()}


def test_ntz_reading_floors_to_epoch(spark, ts_fixture):
    with _conf(spark, NTZ_CONF, "true"):
        df = spark.read.parquet(ts_fixture)
        assert is_ntz(df, "ts")
        assert _epochs(df) == EXPECTED


def test_ltz_reading_matches_ntz(spark, ts_fixture):
    with _conf(spark, NTZ_CONF, "false"):
        df = spark.read.parquet(ts_fixture)
        assert not is_ntz(df, "ts")
        assert dict(df.dtypes)["ts"] == "timestamp"
        assert _epochs(df) == EXPECTED


def test_session_timezone_does_not_change_epochs(spark, ts_fixture):
    """Both branches must be session-tz-independent: the correctness
    driver runs queries under its own session, whose tz we don't control."""
    with _conf(spark, TZ_CONF, "America/New_York"):
        with _conf(spark, NTZ_CONF, "true"):
            assert _epochs(spark.read.parquet(ts_fixture)) == EXPECTED
        with _conf(spark, NTZ_CONF, "false"):
            assert _epochs(spark.read.parquet(ts_fixture)) == EXPECTED


def test_epoch_seconds_rejects_nothing_on_derived_columns(spark, ts_fixture):
    """window().start, min(ts), lag(ts) all inherit the source family;
    the bound converter must analyze cleanly on each (the r3 failure mode
    was an AnalysisException at plan time)."""
    for ntz in ("true", "false"):
        with _conf(spark, NTZ_CONF, ntz):
            df = spark.read.parquet(ts_fixture)
            ep = epoch_of(df)
            out = (
                df.groupBy(F.window("ts", "5 minutes").alias("w"))
                .agg(ep(F.min("ts")).alias("mn"))
                .select(ep("w.start").alias("ws"), "mn")
            )
            rows = out.collect()  # must not throw
            assert all(r["ws"] % 300 == 0 for r in rows)


def test_date_columns_supported(spark):
    df = spark.createDataFrame(
        [(1, dt.date(2024, 1, 1)), (2, dt.date(1999, 12, 31))], "id long, d date"
    )
    ep = epoch_of(df, "d")
    got = {r["id"]: r["e"] for r in df.select("id", ep("d").alias("e")).collect()}
    assert got == {1: 1704067200, 2: 946598400}


def test_epoch_seconds_explicit_branch(spark, ts_fixture):
    with _conf(spark, NTZ_CONF, "true"):
        df = spark.read.parquet(ts_fixture)
        got = {
            r["id"]: r["e"]
            for r in df.select(
                "id", epoch_seconds(F.col("ts"), ntz=True).alias("e")
            ).collect()
        }
        assert got == EXPECTED


@pytest.mark.parametrize("qname", ["stream_tumbling_window", "events_funnel"])
def test_event_queries_run_under_both_timestamp_families(spark, qname):
    """A representative epoch-heavy query must produce identical results
    whether the driver's session reads events.ts as NTZ or LTZ."""
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    fn = QUERIES[qname]
    with _conf(spark, NTZ_CONF, "true"):
        ntz_rows = sorted(map(tuple, fn(spark, sf_dir).collect()))
    with _conf(spark, NTZ_CONF, "false"):
        ltz_rows = sorted(map(tuple, fn(spark, sf_dir).collect()))
    assert ntz_rows == ltz_rows
    assert len(ntz_rows) > 0


def test_ts_family_classification(spark, ts_fixture):
    from mysql2psql_spark.operators.timeutil import ts_family

    df = spark.createDataFrame(
        [(dt.date(2024, 1, 1), dt.datetime(2024, 1, 1))], "d date, t timestamp"
    )
    assert ts_family(df, "d") == "naive"
    assert ts_family(df, "t") == "instant"
    with _conf(spark, NTZ_CONF, "true"):
        assert ts_family(spark.read.parquet(ts_fixture), "ts") == "naive"


def test_range_join_mixed_family_non_utc_session(spark):
    """DATE points vs TIMESTAMP (LTZ) intervals under a non-UTC session:
    the pre-fix operator computed point bins in naive space but interval
    bins in absolute-instant space, so an interval whose end crossed a
    bin boundary under the tz offset (here 03:00 under +05:30) silently
    dropped the matching boundary date. The operator must agree with
    Spark's own inequality-join coercion under ANY session timezone."""
    from mysql2psql_spark.operators.rangejoin import binned_range_join

    with _conf(spark, TZ_CONF, "Asia/Kolkata"):
        points = spark.createDataFrame(
            [(dt.date(1997, 1, d),) for d in range(1, 11)], "p date"
        )
        iv = spark.createDataFrame(
            [("w1", "1997-01-01 00:00:00", "1997-01-08 03:00:00")],
            "wid string, s string, e string",
        ).select("wid", F.to_timestamp("s").alias("s"), F.to_timestamp("e").alias("e"))
        got = sorted(
            r["p"] for r in binned_range_join(
                points, iv, "p", "s", "e", bin_seconds=86400
            ).collect()
        )
        want = sorted(
            r["p"]
            for r in points.join(iv, (points.p >= iv.s) & (points.p < iv.e)).collect()
        )
    assert got == want
    # Jan 8 is the boundary date the pre-fix binning dropped
    assert dt.date(1997, 1, 8) in got
    assert len(got) == 8


def test_range_join_rejects_mixed_interval_bounds(spark):
    from mysql2psql_spark.operators.rangejoin import binned_range_join

    points = spark.createDataFrame([(dt.date(1997, 1, 1),)], "p date")
    iv = spark.createDataFrame(
        [(dt.datetime(1997, 1, 1), dt.date(1997, 1, 8))], "s timestamp, e date"
    )
    with pytest.raises(ValueError, match="family"):
        binned_range_join(points, iv, "p", "s", "e")
