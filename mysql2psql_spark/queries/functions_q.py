"""Scalar-function surface queries (SURVEY.md §2.8, F1-F11 + JSON fill).

Each dumperAuxFuncs row function from the reference compiles to a pure
Column expression (no UDFs anywhere — everything stays in whole-stage
codegen). The queries pin the exact reference semantics, including the
nullable/non-nullable fallback split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql2psql_spark.queries import query
from mysql2psql_spark.rules.dump_functions import (
    convert_str_boolean,
    default_date,
    make_it_time,
    ref_to_nullable,
)
from mysql2psql_spark.sources import load_table


# ---------------------------------------------------------------------------
# F1 CONCAT + F2 CONCAT_WS + F4 LIKE-prefix (libs/MysqlParser.py:188-189,
# 284-285): the FK-reference rendering and precision,scale pair idioms.
# ---------------------------------------------------------------------------
@query(
    "f1_concat_reference",
    oracle="""
    SELECT n_nationkey,
           n_name || ' (' || CAST(n_regionkey AS VARCHAR) || ')' AS fk_ref,
           CONCAT_WS(',', n_name, CAST(n_nationkey AS VARCHAR)) AS name_key,
           UPPER(SUBSTR(n_name, 1, 3)) AS prefix3
    FROM nation
    WHERE n_name LIKE 'NATION_1%'
    """,
)
def f1_concat_reference(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    return n.filter(F.col("n_name").startswith("NATION_1")).select(
        "n_nationkey",
        F.concat(F.col("n_name"), F.lit(" ("), F.col("n_regionkey").cast("string"), F.lit(")")).alias("fk_ref"),
        F.concat_ws(",", F.col("n_name"), F.col("n_nationkey").cast("string")).alias("name_key"),
        F.upper(F.substring("n_name", 1, 3)).alias("prefix3"),
    )


# ---------------------------------------------------------------------------
# F5: the UTC shift — `datetime - INTERVAL 2 HOUR` applied to timestamp
# columns (libs/MysqlParser.py:88-92). Result rendered as a formatted
# string so both engines hash identically.
# ---------------------------------------------------------------------------
@query(
    "f5_interval_shift",
    oracle="""
    SELECT event_id,
           STRFTIME(ts - INTERVAL 2 HOUR, '%Y-%m-%d %H:%M:%S') AS ts_utc
    FROM events
    """,
)
def f5_interval_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.date_format(F.col("ts") - F.expr("INTERVAL 2 HOURS"), "yyyy-MM-dd HH:mm:ss").alias("ts_utc"),
    )


# ---------------------------------------------------------------------------
# F6: convertStrBoolean (dumperAuxFuncs.py:8-11): int(v) truthiness with
# None and unparseable strings -> False. try_cast reproduces the
# swallowed-exception branch.
# ---------------------------------------------------------------------------
@query(
    "f6_boolean_coercion",
    oracle="""
    SELECT o_orderkey,
           COALESCE(TRY_CAST(o_orderpriority AS BIGINT) != 0, FALSE) AS as_bool,
           COALESCE(TRY_CAST(SUBSTR(o_orderpriority, 1, 1) AS BIGINT) != 0, FALSE) AS prefix_bool
    FROM orders
    """,
)
def f6_boolean_coercion(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        convert_str_boolean(F.col("o_orderpriority")).alias("as_bool"),
        convert_str_boolean(F.substring("o_orderpriority", 1, 1)).alias("prefix_bool"),
    )


# ---------------------------------------------------------------------------
# F7/F8: defaultDate / notNullable{Date,Datetime} (dumperAuxFuncs.py:13-27):
# MySQL zero-dates -> NULL when nullable, epoch fallback when NOT NULL.
# The testdata has no zero-dates, so we deterministically synthesize them
# (every 1997 order) in BOTH engines, then apply the fix.
# ---------------------------------------------------------------------------
@query(
    "f7_zero_date_handling",
    oracle="""
    WITH raw AS (
      SELECT o_orderkey,
             CASE WHEN EXTRACT(YEAR FROM o_orderdate) = 1997
                  THEN '0000-00-00' ELSE STRFTIME(o_orderdate, '%Y-%m-%d') END AS raw_date
      FROM orders
    )
    SELECT o_orderkey,
           CASE WHEN raw_date LIKE '0000%' THEN NULL ELSE raw_date END AS date_nullable,
           COALESCE(CASE WHEN raw_date LIKE '0000%' THEN NULL ELSE raw_date END,
                    '1900-01-01') AS date_not_null
    FROM raw
    """,
)
def f7_zero_date_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    raw = F.when(F.year("o_orderdate") == 1997, F.lit("0000-00-00")).otherwise(
        F.date_format("o_orderdate", "yyyy-MM-dd")
    )
    fixed_nullable = default_date(raw, nullable=True)
    fixed_not_null = default_date(raw, nullable=False)
    return o.select(
        "o_orderkey",
        fixed_nullable.alias("date_nullable"),
        fixed_not_null.alias("date_not_null"),
    )


# ---------------------------------------------------------------------------
# F8: notNullableDatetime (dumperAuxFuncs.py:24-27): the datetime twin of
# F7 with the '1900-01-01 00:00:00' epoch fallback.
# ---------------------------------------------------------------------------
@query(
    "f8_zero_datetime_handling",
    oracle="""
    WITH raw AS (
      SELECT event_id,
             CASE WHEN event_id % 7 = 0 THEN '0000-00-00 00:00:00'
                  ELSE STRFTIME(ts, '%Y-%m-%d %H:%M:%S') END AS raw_ts
      FROM events
    )
    SELECT event_id,
           COALESCE(CASE WHEN raw_ts LIKE '0000%' THEN NULL ELSE raw_ts END,
                    '1900-01-01 00:00:00') AS ts_not_null
    FROM raw
    """,
)
def f8_zero_datetime_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mysql2psql_spark.rules.dump_functions import default_datetime

    e = load_table(spark, sf_dir, "events")
    raw = F.when(F.col("event_id") % 7 == 0, F.lit("0000-00-00 00:00:00")).otherwise(
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss")
    )
    return e.select("event_id", default_datetime(raw, nullable=False).alias("ts_not_null"))


# ---------------------------------------------------------------------------
# F10: makeItEmpty (dumperAuxFuncs.py:34-36): blob payloads are not
# migrated — NULL when nullable, '' when NOT NULL.
# ---------------------------------------------------------------------------
@query(
    "f10_blob_empty",
    oracle="""
    SELECT doc_id, CAST(NULL AS VARCHAR) AS blob_nullable, '' AS blob_not_null
    FROM documents
    """,
)
def f10_blob_empty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mysql2psql_spark.rules.dump_functions import make_it_empty

    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        make_it_empty(F.col("text"), nullable=True).alias("blob_nullable"),
        make_it_empty(F.col("text"), nullable=False).alias("blob_not_null"),
    )


# ---------------------------------------------------------------------------
# F9: refToNullable (dumperAuxFuncs.py:29-32): FK value 0 means "no parent"
# -> NULL for nullable reference columns.
# ---------------------------------------------------------------------------
@query(
    "f9_fk_zero_to_null",
    oracle="""
    SELECT l_orderkey, l_linenumber, NULLIF(l_suppkey, 0) AS suppkey_ref
    FROM lineitem
    """,
)
def f9_fk_zero_to_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber", ref_to_nullable(F.col("l_suppkey")).alias("suppkey_ref")
    )


# ---------------------------------------------------------------------------
# F11: makeItTime (dumperAuxFuncs.py:38-41): keep iff value matches HH:MM,
# else NULL (nullable) / '00:00' (not null). Invalid values synthesized
# deterministically in both engines.
# ---------------------------------------------------------------------------
@query(
    "f11_time_guard",
    oracle="""
    WITH raw AS (
      SELECT event_id,
             CASE WHEN event_id % 10 = 0 THEN 'not-a-time'
                  ELSE STRFTIME(ts, '%H:%M') END AS raw_time
      FROM events
    )
    SELECT event_id,
           CASE WHEN regexp_matches(raw_time, '^\\d\\d:\\d\\d') THEN raw_time ELSE NULL END AS time_nullable,
           CASE WHEN regexp_matches(raw_time, '^\\d\\d:\\d\\d') THEN raw_time ELSE '00:00' END AS time_not_null
    FROM raw
    """,
)
def f11_time_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    raw = F.when(F.col("event_id") % 10 == 0, F.lit("not-a-time")).otherwise(
        F.date_format("ts", "HH:mm")
    )
    return e.select(
        "event_id",
        make_it_time(raw, nullable=True).alias("time_nullable"),
        make_it_time(raw, nullable=False).alias("time_not_null"),
    )


# ---------------------------------------------------------------------------
# JSON extraction fill (SURVEY §2.8 note): events.props is a JSON string;
# the engine exposes get_json_object / from_json (the reference only uses
# JSON for config, never as data — this is extension surface).
# ---------------------------------------------------------------------------
@query(
    "f_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
    FROM events
    """,
)
def f_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
    )
