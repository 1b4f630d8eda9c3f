"""The spark.sql entry path: the same ANSI SQL text the DuckDB oracle
runs must (modulo dialect functions) be runnable through Spark's SQL API
over `register_views`, and agree with the DataFrame implementation. This
pins the second half of the "DataFrame/SQL" API surface — a user who
prefers SQL strings over the fluent API gets identical results from the
same session.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mysql2psql_spark.queries import QUERIES
from mysql2psql_spark.sources import register_views
from tests.conftest import SF_DIR_ORACLE


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_sql_q01_matches_dataframe(spark):
    register_views(spark, SF_DIR_ORACLE, "lineitem")
    got = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_qty,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        """
    )
    want = (
        QUERIES["q01_pricing_summary"](spark, SF_DIR_ORACLE)
        .select("l_returnflag", "l_linestatus", "sum_qty", "count_order")
    )
    cols = ["l_returnflag", "l_linestatus", "sum_qty", "count_order"]
    assert _rows(got, cols) == _rows(want, cols)


def test_sql_window_matches_dataframe(spark):
    register_views(spark, SF_DIR_ORACLE, "events")
    got = spark.sql(
        """
        SELECT user_id, event_type, n
        FROM (
          SELECT user_id, event_type, COUNT(*) AS n,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY COUNT(*) DESC, event_type) AS rn
          FROM events GROUP BY user_id, event_type
        ) WHERE rn = 1
        """
    )
    want = QUERIES["a5_mode_per_group"](spark, SF_DIR_ORACLE).select(
        "user_id", F.col("mode_type").alias("event_type"), F.col("n_events").alias("n")
    )
    cols = ["user_id", "event_type", "n"]
    assert _rows(got, cols) == _rows(want, cols)


def test_sql_join_matches_dataframe(spark):
    register_views(spark, SF_DIR_ORACLE, "customer", "orders")
    got = spark.sql(
        """
        SELECT c_count, COUNT(*) AS custdist
        FROM (
          SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer LEFT OUTER JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
          GROUP BY c_custkey
        ) GROUP BY c_count
        """
    )
    want = QUERIES["q13_customer_distribution"](spark, SF_DIR_ORACLE)
    cols = ["c_count", "custdist"]
    assert _rows(got, cols) == _rows(want, cols)
