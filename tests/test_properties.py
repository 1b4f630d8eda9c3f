"""Property tests (SURVEY.md §5 item 4): the Column-expression dump
functions agree with direct Python models of the reference's row
functions (/root/reference/dumperAuxFuncs.py) on arbitrary inputs."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mysql2psql_spark.rules.dump_functions import (
    convert_str_boolean,
    default_date,
    make_it_time,
    ref_to_nullable,
)

# value universe: numeric strings, garbage, zero-dates, real dates, None
VALUES = st.one_of(
    st.none(),
    st.integers(-5, 5).map(str),
    st.sampled_from(
        ["0000-00-00", "0000-00-00 00:00:00", "2020-05-01", "12:34", "9:30", "xx", "", "7.5"]
    ),
    st.text(alphabet="0123456789:-x ", max_size=12),
)


def _ref_convert_str_boolean(v):
    # dumperAuxFuncs.py:8-11: bool(int(value)) with any failure -> False
    try:
        return bool(int(v))
    except (TypeError, ValueError):
        return False


def _ref_default_date(v, nullable):
    # dumperAuxFuncs.py:13-21: zero-date prefix or NULL -> NULL / epoch
    bad = v is None or str(v).startswith("0000")
    if bad:
        return None if nullable else "1900-01-01"
    return v


def _ref_make_it_time(v, nullable):
    # dumperAuxFuncs.py:38-41: keep iff matches ^\d\d:\d\d
    ok = v is not None and re.match(r"^\d\d:\d\d", str(v))
    if ok:
        return v
    return None if nullable else "00:00"


def _ref_to_nullable(v):
    # dumperAuxFuncs.py:29-32: 0/'0' -> NULL
    return None if (v is not None and str(v) == "0") else v


@settings(max_examples=30, deadline=None)
@given(st.lists(VALUES, min_size=1, max_size=8))
def test_dump_functions_match_reference_model(spark_prop, values):
    spark = spark_prop
    df = spark.createDataFrame([(v,) for v in values], "v string")
    rows = df.select(
        convert_str_boolean(F.col("v")).alias("b"),
        default_date(F.col("v"), nullable=True).alias("dn"),
        default_date(F.col("v"), nullable=False).alias("dnn"),
        make_it_time(F.col("v"), nullable=True).alias("tn"),
        make_it_time(F.col("v"), nullable=False).alias("tnn"),
        ref_to_nullable(F.col("v")).alias("r"),
    ).collect()
    for v, r in zip(values, rows):
        assert r.b == _ref_convert_str_boolean(v), (v, r.b)
        assert r.dn == _ref_default_date(v, True), (v, r.dn)
        assert r.dnn == _ref_default_date(v, False), (v, r.dnn)
        assert r.tn == _ref_make_it_time(v, True), (v, r.tn)
        assert r.tnn == _ref_make_it_time(v, False), (v, r.tnn)
        assert r.r == _ref_to_nullable(v), (v, r.r)
