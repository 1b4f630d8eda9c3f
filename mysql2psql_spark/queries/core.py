"""Core relational operator queries (SURVEY.md §2.1-2.7).

Each query is the Spark-first expression of a reference operator, tagged
with the SURVEY id it covers. Money math goes through DECIMAL so sums are
exact and engine-order-independent, then is rounded and normalized to
DOUBLE for the oracle hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from mysql2psql_spark.queries import query
from mysql2psql_spark.sources import load_table


def _dec(c: str) -> Column:
    return F.col(c).cast("decimal(12,4)")


def _money(col: Column) -> Column:
    """Exact decimal aggregate -> round(2) -> double (oracle-stable)."""
    return F.round(col, 2).cast("double")


# ---------------------------------------------------------------------------
# Flagship: TPC-H-Q1-shaped pricing summary.
# Covers S4 scan, P1 filter pushdown, A-series hash aggregation with
# map-side partial agg; the groupBy keys are low-cardinality so the shuffle
# moves only |groups| x |partitions| rows at any scale.
# ---------------------------------------------------------------------------
@query(
    "q01_pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_qty,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_base_price,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l_discount AS DECIMAL(12,4)))), 2) AS DOUBLE) AS sum_disc_price,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l_discount AS DECIMAL(12,4))) * (1 + CAST(l_tax AS DECIMAL(12,4)))), 2) AS DOUBLE) AS sum_charge,
      ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
      ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE) / COUNT(*), 6) AS avg_price,
      ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(12,4))) AS DOUBLE) / COUNT(*), 6) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    charge = disc_price * (F.lit(1) + _dec("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02 00:00:00")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _money(F.sum(_dec("l_quantity"))).alias("sum_qty"),
            _money(F.sum(_dec("l_extendedprice"))).alias("sum_base_price"),
            _money(F.sum(disc_price)).alias("sum_disc_price"),
            _money(F.sum(charge)).alias("sum_charge"),
            F.round(F.sum(_dec("l_quantity")).cast("double") / F.count("*"), 6).alias("avg_qty"),
            F.round(F.sum(_dec("l_extendedprice")).cast("double") / F.count("*"), 6).alias("avg_price"),
            F.round(F.sum(_dec("l_discount")).cast("double") / F.count("*"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# S4 + P2: full-table scan with projection pushdown
# (reference builds the SELECT list by hand: libs/PsqlParser.py:125-126 ->
# libs/MysqlParser.py:127; Catalyst's ColumnPruning reaches the Parquet
# ReadSchema for free).
# ---------------------------------------------------------------------------
@query(
    "s4_scan_projection",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem WHERE l_orderkey < 1000
    """,
)
def s4_scan_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_orderkey", "l_linenumber", "l_extendedprice").filter(
        F.col("l_orderkey") < 1000
    )


# ---------------------------------------------------------------------------
# P1: user `_WHERE_` predicate pushed into the source scan
# (libs/MysqlParser.py:133-134). Expressed declaratively; .explain shows it
# in PushedFilters.
# ---------------------------------------------------------------------------
@query(
    "p1_filter_pushdown",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice > 150000.0
    """,
)
def p1_filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.filter((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 150000.0)).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


# ---------------------------------------------------------------------------
# P3: projection-with-rename (cols_to, libs/PsqlParser.py:127-129 applying
# rename rules libs/RuleHandler.py:61-73).
# ---------------------------------------------------------------------------
@query(
    "p3_rename_project",
    oracle="""
    SELECT c_custkey AS id, UPPER(c_name) AS name_upper, c_mktsegment AS segment
    FROM customer
    """,
)
def p3_rename_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("id"),
        F.upper("c_name").alias("name_upper"),
        F.col("c_mktsegment").alias("segment"),
    )


# ---------------------------------------------------------------------------
# P6: conditional attribute rewrite — the `_IF_` rule shape
# (libs/RuleHandler.py:92-103; e.g. tinyint->smallint unless tinyint(1)->
# boolean, rules/mysql_to_psql.json:5-19) as a when/otherwise chain.
# ---------------------------------------------------------------------------
@query(
    "p6_conditional_rewrite",
    oracle="""
    SELECT p_partkey,
           CASE WHEN p_size = 1 THEN 'boolean'
                WHEN p_size <= 5 THEN 'smallint'
                ELSE 'int' END AS mapped_type
    FROM part
    """,
)
def p6_conditional_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.when(F.col("p_size") == 1, "boolean")
        .when(F.col("p_size") <= 5, "smallint")
        .otherwise("int")
        .alias("mapped_type"),
    )


# ---------------------------------------------------------------------------
# J1: pushdown inner equi-join + filter (libs/MysqlParser.py:113-134).
# Fact-to-fact join shuffles on the key; AQE picks the strategy. Low-
# cardinality output keeps the final shuffle tiny at any SF.
# ---------------------------------------------------------------------------
@query(
    "j1_inner_join",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_lines,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l.l_discount AS DECIMAL(12,4)))), 2) AS DOUBLE) AS revenue
    FROM lineitem l INNER JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY o.o_orderpriority
    """,
)
def j1_inner_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey, "inner")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_lines"), _money(F.sum(revenue)).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# J2: left outer equi-join chain over the dimension tables
# (libs/MysqlParser.py:192-194's catalog LEFT JOIN). nation/region are tiny
# at every SF -> broadcast, no shuffle of the big side.
# ---------------------------------------------------------------------------
@query(
    "j2_left_join_dims",
    oracle="""
    SELECT c.c_custkey, n.n_name AS nation_name, r.r_name AS region_name
    FROM customer c
    LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def j2_left_join_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left")
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "left")
        .select(
            "c_custkey",
            F.col("n_name").alias("nation_name"),
            F.col("r_name").alias("region_name"),
        )
    )


# ---------------------------------------------------------------------------
# J3 (anti): orphan detection — the `_PRE_SQL_` DELETE ... NOT IN idiom
# (rules/schema_changes.json:4-6) re-expressed immutably as a left_anti
# join (SURVEY J3). Here: lineitems whose order is not open.
# ---------------------------------------------------------------------------
@query(
    "j3_anti_join",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber
    FROM lineitem l
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_orderkey = l.l_orderkey AND o.o_orderstatus = 'O'
    )
    """,
)
def j3_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    open_orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return li.join(
        open_orders, li.l_orderkey == open_orders.o_orderkey, "left_anti"
    ).select("l_orderkey", "l_linenumber")


# ---------------------------------------------------------------------------
# J3 (semi): the keep-side of the same idiom — EXISTS as left_semi.
# ---------------------------------------------------------------------------
@query(
    "j3_semi_join",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000.0
    )
    """,
)
def j3_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000.0)
    return c.join(big, c.c_custkey == big.o_custkey, "left_semi").select("c_custkey", "c_name")


# ---------------------------------------------------------------------------
# J4: repair-join — null-out/zero orphan FKs instead of deleting
# (the commented-out UPDATE ... LEFT JOIN at libs/MysqlParser.py:71-85).
# ---------------------------------------------------------------------------
@query(
    "j4_repair_join",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber,
           CASE WHEN o.o_orderkey IS NULL THEN 0 ELSE l.l_orderkey END AS repaired_orderkey
    FROM lineitem l
    LEFT JOIN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'O') o
      ON l.l_orderkey = o.o_orderkey
    """,
)
def j4_repair_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select("o_orderkey")
    )
    return li.join(o, li.l_orderkey == o.o_orderkey, "left").select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("o_orderkey").isNull(), F.lit(0))
        .otherwise(F.col("l_orderkey"))
        .cast("long")
        .alias("repaired_orderkey"),
    )


# ---------------------------------------------------------------------------
# A1: hash group-by + ORDERED string agg — GROUP_CONCAT(x ORDER BY k)
# (libs/MysqlParser.py:233-242). collect_list alone is unordered; the
# ordering is made explicit via array_sort over (key, value) structs, which
# keeps the whole aggregate a single map-side-combinable hash agg (no
# window, no second shuffle).
# ---------------------------------------------------------------------------
@query(
    "a1_ordered_string_agg",
    oracle="""
    SELECT l_orderkey,
           STRING_AGG(CAST(l_linenumber AS VARCHAR), ',' ORDER BY l_linenumber) AS line_numbers,
           COUNT(*) AS n_lines
    FROM lineitem
    GROUP BY l_orderkey
    """,
)
def a1_ordered_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pairs = F.collect_list(F.struct(F.col("l_linenumber").alias("k"), F.col("l_linenumber").cast("string").alias("v")))
    ordered = F.transform(F.array_sort(pairs), lambda x: x["v"])
    return li.groupBy("l_orderkey").agg(
        F.array_join(ordered, ",").alias("line_numbers"),
        F.count("*").alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# A2: distinct via GROUP BY (libs/MysqlParser.py:287).
# ---------------------------------------------------------------------------
@query(
    "a2_distinct",
    oracle="SELECT DISTINCT c_mktsegment FROM customer",
)
def a2_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select("c_mktsegment").distinct()


# ---------------------------------------------------------------------------
# A3 + min/max stats: affected-row counting (libs/MysqlParser.py:99-100)
# generalized to grouped counts with exact min/max passthrough.
# ---------------------------------------------------------------------------
@query(
    "a3_grouped_stats",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS cnt,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price,
           COUNT(DISTINCT o_custkey) AS n_customers
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def a3_grouped_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count("*").alias("cnt"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


# ---------------------------------------------------------------------------
# §2.5 window fill: ranking — top order per customer. ROW_NUMBER with a
# unique tie-break so the result set is deterministic.
# ---------------------------------------------------------------------------
@query(
    "w1_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
)
def w1_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# §2.5 window fill: lag — per-customer price delta between consecutive
# orders. Same operands both engines -> exact double subtraction.
# ---------------------------------------------------------------------------
@query(
    "w2_lag_delta",
    oracle="""
    SELECT o_custkey, o_orderkey,
           o_totalprice - LAG(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS price_delta
    FROM orders
    """,
)
def w2_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        (F.col("o_totalprice") - F.lag("o_totalprice").over(w)).alias("price_delta"),
    )


# ---------------------------------------------------------------------------
# §2.5 window fill: running sum over an explicit ROWS frame; DECIMAL makes
# the cumulative sum exact in both engines.
# ---------------------------------------------------------------------------
@query(
    "w3_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,4))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_total
    FROM orders
    """,
)
def w3_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        _money(F.sum(_dec("o_totalprice")).over(w)).alias("running_total"),
    )


# ---------------------------------------------------------------------------
# O-series: global top-k with unique tie-break (deterministic LIMIT).
# Spark executes this as a TakeOrderedAndProject — no global sort shuffle.
# ---------------------------------------------------------------------------
@query(
    "o1_global_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def o1_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# §2.7 set operations (the reference only has the NOT IN idiom; union /
# intersect / except are the Spark-native fills, incl. the multi-database
# unionByName shape of main.py:167).
# ---------------------------------------------------------------------------
_SET_A = "SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'"
_SET_B = "SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'"


def _set_sides(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a, b


@query("set_union", oracle=f"{_SET_A} UNION {_SET_B}")
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _set_sides(spark, sf_dir)
    return a.unionByName(b).distinct()


@query("set_intersect", oracle=f"{_SET_A} INTERSECT {_SET_B}")
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _set_sides(spark, sf_dir)
    return a.intersect(b)


@query("set_except", oracle=f"{_SET_A} EXCEPT {_SET_B}")
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _set_sides(spark, sf_dir)
    # subtract = EXCEPT DISTINCT (exceptAll would be bag-difference and
    # keep keys that appear more often in A than in B)
    return a.subtract(b)


# ---------------------------------------------------------------------------
# §2.4 fill: rollup — multi-level aggregate in one pass (partial aggs are
# reused across grouping sets; one shuffle).
# ---------------------------------------------------------------------------
@query(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_qty,
           COUNT(*) AS cnt
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        _money(F.sum(_dec("l_quantity"))).alias("sum_qty"),
        F.count("*").alias("cnt"),
    )


# ---------------------------------------------------------------------------
# §2.4 fill: cube + grouping sets — the remaining multi-dimensional
# aggregate shapes (same one-shuffle property as rollup).
# ---------------------------------------------------------------------------
@query(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_price,
           COUNT(*) AS cnt
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        _money(F.sum(_dec("l_extendedprice"))).alias("sum_price"),
        F.count("*").alias("cnt"),
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


# ---------------------------------------------------------------------------
# §2.4 fill: approximate distinct count (HLL). Raw estimates are
# engine-specific, so the driver-hashed columns are the exact count plus
# each engine's own within-5% assertion over its HLL estimate — the
# estimate is still computed and checked on both sides, and the row set
# hash-matches exactly.
# ---------------------------------------------------------------------------
@query(
    "agg_approx_distinct",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS exact_custs,
           ABS(approx_count_distinct(o_custkey) - COUNT(DISTINCT o_custkey))
             <= 0.05 * COUNT(DISTINCT o_custkey) AS approx_ok
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("exact_custs"),
        F.approx_count_distinct("o_custkey", rsd=0.01).alias("_approx"),
    )
    return agg.select(
        "o_orderstatus",
        "exact_custs",
        (F.abs(F.col("_approx") - F.col("exact_custs")) <= 0.05 * F.col("exact_custs")).alias(
            "approx_ok"
        ),
    )


# ---------------------------------------------------------------------------
# P4: column drop (`_SKIP_`, libs/RuleHandler.py:66-69) as a standalone
# projection query — the kept-column SELECT list the reference builds at
# libs/PsqlParser.py:125-126.
# ---------------------------------------------------------------------------
@query(
    "p4_skip_columns",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority
    FROM orders
    """,
)
def p4_skip_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.drop("o_totalprice", "o_orderdate")


# ---------------------------------------------------------------------------
# §2.5 fill: the remaining analytic-window family — ntile quartiles,
# percent_rank, and first/last value over a frame.
# ---------------------------------------------------------------------------
@query(
    "w4_analytic_functions",
    oracle="""
    SELECT c_custkey,
           NTILE(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS balance_quartile,
           ROUND(PERCENT_RANK() OVER (ORDER BY c_acctbal DESC, c_custkey), 6) AS pct_rank,
           FIRST_VALUE(c_custkey) OVER (
             PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS segment_top_cust
    FROM customer
    """,
)
def w4_analytic_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    c = load_table(spark, sf_dir, "customer")
    global_w = W.orderBy(F.col("c_acctbal").desc(), "c_custkey")
    seg_w = (
        W.partitionBy("c_mktsegment")
        .orderBy(F.col("c_acctbal").desc(), "c_custkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return c.select(
        "c_custkey",
        F.ntile(4).over(global_w).alias("balance_quartile"),
        F.round(F.percent_rank().over(global_w), 6).alias("pct_rank"),
        F.first("c_custkey").over(seg_w).alias("segment_top_cust"),
    )


# ---------------------------------------------------------------------------
# §2.4 fill: approximate quantiles (KLL/GK-style sketch), same evidence
# pattern as agg_approx_distinct — sketches are engine-specific, so the
# hashed columns are exact interpolated percentiles plus each engine's
# own within-5% assertion over its sketch estimate.
# ---------------------------------------------------------------------------
@query(
    "agg_approx_quantiles",
    oracle="""
    SELECT l_returnflag,
           FLOOR(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5) * 100) / 100 AS p50_exact,
           FLOOR(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.95) * 100) / 100 AS p95_exact,
           ABS(approx_quantile(CAST(l_extendedprice AS DOUBLE), 0.5)
               - quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5))
             <= 0.05 * quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5) AS approx_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    v = F.col("l_extendedprice").cast("double")
    agg = li.groupBy("l_returnflag").agg(
        F.percentile(v, 0.5).alias("_e50"),
        F.percentile(v, 0.95).alias("_e95"),
        F.percentile_approx(v, 0.5, 10000).alias("_a50"),
    )
    # FLOOR(x*100)/100, not ROUND(x, 2): a percentile interpolation can
    # land on a .xx5 half-boundary of a binary double, where engines'
    # ROUND implementations disagree (observed: Spark .24 vs DuckDB .25
    # on ...244999999995); floor of the identical IEEE product is exact
    # in both.
    return agg.select(
        "l_returnflag",
        (F.floor(F.col("_e50") * 100) / 100).alias("p50_exact"),
        (F.floor(F.col("_e95") * 100) / 100).alias("p95_exact"),
        (F.abs(F.col("_a50") - F.col("_e50")) <= 0.05 * F.col("_e50")).alias("approx_ok"),
    )


# ---------------------------------------------------------------------------
# PIVOT (§2.4 fill): long-to-wide with an EXPLICIT value list —
# groupBy().pivot(col, values) compiles to one hash aggregate with a
# conditional-count per pivot value (no second shuffle, no distinct-scan
# to discover values — passing the list keeps the plan static and the
# output schema deterministic, both required at 100 TB and by the
# oracle's fixed column set).
# ---------------------------------------------------------------------------
_EVENT_TYPES = ("view", "click", "purchase", "signup", "error")


@query(
    "agg_pivot_event_types",
    oracle="""
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'view')     AS n_view,
           COUNT(*) FILTER (WHERE event_type = 'click')    AS n_click,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
           COUNT(*) FILTER (WHERE event_type = 'error')    AS n_error
    FROM events GROUP BY user_id
    """,
)
def agg_pivot_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    wide = (
        e.groupBy("user_id")
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    return wide.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in _EVENT_TYPES],
    )


# ---------------------------------------------------------------------------
# UNPIVOT / melt (§2.4 fill, the inverse): wide-to-long via the built-in
# unpivot (STACK) — row-local, zero shuffles; the metric name becomes a
# key column a downstream groupBy can aggregate uniformly.
# ---------------------------------------------------------------------------
@query(
    "p7_unpivot_metrics",
    oracle="""
    SELECT c_custkey, metric, val FROM (
      SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS val FROM customer
      UNION ALL
      SELECT c_custkey, 'nationkey', CAST(c_nationkey AS DOUBLE) FROM customer
    )
    """,
)
def p7_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nationkey"),
    ).unpivot("c_custkey", ["acctbal", "nationkey"], "metric", "val")


# ---------------------------------------------------------------------------
# Statistical aggregates (§2.4 fill): per-group corr / covariance /
# stddev — the profiling moments a pipeline computes before feature
# normalization. One hash aggregate with map-side combine (Spark's
# single-pass co-moment merge), output rows = |groups|. Results are
# rounded to 6 places: both engines merge co-moments in different
# orders, identical to ~1e-12 relative on this data.
# ---------------------------------------------------------------------------
@query(
    "a4_statistical_moments",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           ROUND(AVG(value), 6) AS mean_value,
           ROUND(STDDEV_SAMP(value), 6) AS sd_value,
           ROUND(CORR(value, CAST(user_id AS DOUBLE)), 6) AS corr_value_user,
           ROUND(COVAR_SAMP(value, CAST(user_id AS DOUBLE)), 6) AS covar_value_user
    FROM events GROUP BY event_type
    """,
)
def a4_statistical_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    u = F.col("user_id").cast("double")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.avg("value"), 6).alias("mean_value"),
        F.round(F.stddev_samp("value"), 6).alias("sd_value"),
        F.round(F.corr(F.col("value"), u), 6).alias("corr_value_user"),
        F.round(F.covar_samp(F.col("value"), u), 6).alias("covar_value_user"),
    )


# ---------------------------------------------------------------------------
# O4: keyset (seek-method) pagination — the scalable replacement for
# OFFSET: WHERE (sort_key, unique_key) > (cursor) ORDER BY ... LIMIT n.
# The cursor disjunction pushes to the parquet scan (an OR of range
# predicates — PushedFilters pinned in test_plans) and the page is
# TakeOrderedAndProject, so cost is scan-of-qualifying + top-n; an
# OFFSET 10_000_000 plan would sort/skip ten million rows per page.
# ---------------------------------------------------------------------------
@query(
    "o4_keyset_pagination",
    oracle="""
    SELECT STRFTIME(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_orderkey,
           CAST(ROUND(CAST(o_totalprice AS DECIMAL(12,4)), 2) AS DOUBLE) AS totalprice
    FROM orders
    WHERE o_orderdate > TIMESTAMP '1998-01-01 00:00:00'
       OR (o_orderdate = TIMESTAMP '1998-01-01 00:00:00' AND o_orderkey > 7500)
    ORDER BY o_orderdate, o_orderkey
    LIMIT 100
    """,
)
def o4_keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    cursor_date = F.to_timestamp(F.lit("1998-01-01 00:00:00"))
    o = load_table(spark, sf_dir, "orders")
    page = (
        o.filter(
            (F.col("o_orderdate") > cursor_date)
            | ((F.col("o_orderdate") == cursor_date) & (F.col("o_orderkey") > 7500))
        )
        .orderBy("o_orderdate", "o_orderkey")
        .limit(100)
    )
    return page.select(
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        "o_orderkey",
        F.round(F.col("o_totalprice").cast("decimal(12,4)"), 2)
        .cast("double")
        .alias("totalprice"),
    )


# ---------------------------------------------------------------------------
# W5: analytic distribution functions — percent_rank / cume_dist over a
# per-type total order. The (value, event_id) ordering key is unique, so
# rank boundaries are deterministic and the n/m ratios are identical
# IEEE divisions in both engines.
# ---------------------------------------------------------------------------
@query(
    "w5_distribution_functions",
    oracle="""
    SELECT event_id, event_type,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
    """,
)
def w5_distribution_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale caveat (deliberate, re-measured r10): percent_rank/cume_dist
    # are inherently total-order per partition key — with few event
    # types each window partition carries that type's whole event stream
    # through one task. The exact two-phase decomposition (range-bucket
    # cuts + per-bucket row_number + broadcast prefix offsets) EXISTS as
    # operators/analytics.py::distribution_ranks — it matched this
    # oracle hash-exactly, but interleaved A/B medians at sf0.1 read
    # 0.99-1.12 s vs 0.21 s for this window (the cuts aggregation +
    # offset join are fixed costs that only amortize at per-key
    # cardinalities far beyond this dataset), so the registered query
    # keeps the window and the operator is the documented 100 TB path.
    # The registered scale-safe sibling for quantile BUCKETING (the
    # common case) is text_approx_strata.
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy("value", "event_id")
    return e.select(
        "event_id",
        "event_type",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


# ---------------------------------------------------------------------------
# W7: the DECLARED 100 TB path for w4/w5's distribution windows, as its
# own exact-oracled row (r10 verdict, Missing #2): operators/analytics.py
# ::distribution_ranks computes exact rank / percent_rank / cume_dist via
# range-bucket cuts + per-bucket row_number + broadcast prefix offsets —
# no per-key total-order window anywhere (the executed plan's only
# unpartitioned window is the n_buckets-row offset prefix sum). The
# oracle is the PLAIN window formulation: the decomposition must
# reproduce it bit-exactly ((value, event_id) is unique per type, so
# rank == row_number and the n/m ratios are identical IEEE divisions).
# w5 stays registered as the exact-semantics window row; this row proves
# the scale path end-to-end under the driver's gate.
# ---------------------------------------------------------------------------
@query(
    "w7_two_phase_distribution",
    oracle="""
    SELECT event_id, event_type,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS rank,
           CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
    """,
)
def w7_two_phase_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mysql2psql_spark.operators.analytics import distribution_ranks

    e = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    # n_buckets trades the per-row bucket probe (an interpreted HOF over
    # the cuts array, ~linear in bucket count: 64 -> 1.96 s, 16 -> 1.14 s,
    # 8 -> 0.98 s interleaved medians at sf0.1) against per-bucket window
    # parallelism; ranks are bucket-count-invariant (the oracle has no
    # buckets at all). 16 keeps 5 x 16 = 80-way window parallelism at
    # test scale; at 10^8+ rows/key raise it toward the operator's 64+
    # default so single-bucket sorts stay within task memory.
    out = distribution_ranks(e, "event_type", ["value", "event_id"], n_buckets=16)
    return out.select(
        "event_id",
        "event_type",
        F.col("rank").cast("bigint").alias("rank"),
        F.col("n").cast("bigint").alias("n"),
        F.round("pct_rank", 6).alias("pct_rank"),
        F.round("cume", 6).alias("cume"),
    )


# ---------------------------------------------------------------------------
# A5: per-group statistical mode (most frequent event_type per user,
# count-desc then lexicographic tie-break) — two uniform hash aggs + a
# per-user-sized window; the raw event stream never sorts globally.
# ---------------------------------------------------------------------------
@query(
    "a5_mode_per_group",
    oracle="""
    SELECT user_id, event_type AS mode_type, CAST(n AS BIGINT) AS n_events
    FROM (
      SELECT user_id, event_type, n,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY n DESC, event_type
             ) AS rn
      FROM (SELECT user_id, event_type, COUNT(*) AS n
            FROM events GROUP BY 1, 2)
    ) WHERE rn = 1
    """,
)
def a5_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    w = W.partitionBy("user_id").orderBy(F.col("n").desc(), "event_type")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("mode_type"), F.col("n").alias("n_events"))
    )


# ---------------------------------------------------------------------------
# O5: Z-order layout key — the physical-layout operator the migrator
# applies at write time (operators/layout.py) exposed as a checkable
# query: each order gets its Morton-interleaved (customer, order-day)
# Z-value and the contiguous curve segment (file bucket) it would land
# in. Both dimensions are masked to 10 bits; the bucket is the top 6
# bits of the 20-bit curve, i.e. 64 target files. The oracle's bit
# expression is GENERATED by the same loop as the Spark expression
# (operators/layout.py::zorder_key_sql), so the two cannot drift.
# ---------------------------------------------------------------------------
from mysql2psql_spark.operators.layout import zorder_key, zorder_key_sql  # noqa: E402

_Z_SQL = zorder_key_sql("(o_custkey & 1023)", "(day_ord & 1023)", bits=10)


@query(
    "o5_zorder_layout",
    oracle=f"""
    WITH t AS (
      SELECT o_orderkey, o_custkey,
             CAST(FLOOR(EPOCH(o_orderdate)) AS BIGINT) // 86400 AS day_ord
      FROM orders
    )
    SELECT o_orderkey,
           CAST({_Z_SQL} AS BIGINT) AS zval,
           CAST({_Z_SQL} >> 14 AS BIGINT) AS file_bucket
    FROM t
    """,
)
def o5_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mysql2psql_spark.operators.timeutil import epoch_of

    o = load_table(spark, sf_dir, "orders")
    ep = epoch_of(o, "o_orderdate")
    t = o.select(
        "o_orderkey",
        "o_custkey",
        F.floor(ep("o_orderdate") / 86400).cast("bigint").alias("day_ord"),
    )
    mask = F.lit(1023)
    z = zorder_key(
        F.col("o_custkey").bitwiseAND(mask),
        F.col("day_ord").bitwiseAND(mask),
        bits=10,
    )
    return t.select(
        "o_orderkey",
        z.alias("zval"),
        F.shiftright(z, 14).cast("bigint").alias("file_bucket"),
    )


# ---------------------------------------------------------------------------
# O6: bucketed co-located join — the write-time layout contract of
# operators/layout.py::write_bucketed exercised end-to-end: orders and
# lineitem are persisted ONCE per session as bucketed tables hashed on the
# join key (the reference's D7 secondary indexes, libs/PsqlParser.py:405-
# 420, play this pay-once-at-write role on the PostgreSQL side), and the
# join then runs with NO exchange on either side — the scan's bucket spec
# IS the join's required distribution, so EnsureRequirements inserts
# nothing (plan pinned in tests/test_operators.py::
# test_bucketed_join_is_exchange_free). At 100 TB this is THE fact-join
# strategy: every downstream orderkey join is exchange-free forever. The
# oracle is the plain join — bucketing must not change a single value.
# ---------------------------------------------------------------------------
@query(
    "o6_bucketed_join",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,4))), 2) AS DOUBLE)
             AS sum_price
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def o6_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import re as _re

    from mysql2psql_spark.operators.layout import (
        derived_bucket_count,
        ensure_bucketed_table,
    )

    # table identity carries the sf dir, so warmup (sf0.001) and measured
    # (sf0.1) runs in one bench session get distinct layouts; the write
    # runs once per session (the pay-the-shuffle-once contract — within a
    # session, repeat runs measure the exchange-free join, which is the
    # steady-state a production table amortizes to). Data lands under the
    # SESSION-UNIQUE mkdtemp scratch of ensure_bucketed_table — the r10
    # fixed world-shared /tmp path let two concurrent sessions race
    # overwrite writes into one directory (ADVICE r10, medium).
    tag = _re.sub(r"\W+", "_", sf_dir.strip("/"))
    # bucket count derived, not hardcoded (VERDICT r11 #6): both tables
    # share the orderkey domain so they derive the SAME count (the
    # exchange-free join needs matching specs); the width floor applies
    # at bench scale, est_bytes/128MB at 100 TB.
    n_bkt = derived_bucket_count(spark)
    t_orders = ensure_bucketed_table(
        spark,
        f"bkt_orders_{tag}",
        ["o_orderkey"],
        n_bkt,
        lambda: load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority"
        ),
    )
    t_lines = ensure_bucketed_table(
        spark,
        f"bkt_lineitem_{tag}",
        ["o_orderkey"],
        n_bkt,
        lambda: load_table(spark, sf_dir, "lineitem").select(
            F.col("l_orderkey").alias("o_orderkey"), "l_extendedprice"
        ),
    )
    joined = t_orders.join(t_lines, "o_orderkey")
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_lines"),
        _money(F.sum(_dec("l_extendedprice"))).alias("sum_price"),
    )


# ---------------------------------------------------------------------------
# A6: winsorized statistics — per-group p05/p95 clipping (the standard
# outlier-robust feature-prep transform) with EXACT interpolated
# percentiles: Spark's `percentile` and DuckDB's `quantile_cont` use the
# same linear interpolation and agree bit-for-bit on this data (probed
# before committing the oracle). Two-pass shape by choice: a 3-row
# percentile aggregate broadcast-joined back to the fact — at 100 TB two
# column-pruned scans beat the full-width sort a window formulation
# would shuffle. Clipped values are settled into DECIMAL before the
# mean so the sum is order-free.
# ---------------------------------------------------------------------------
@query(
    "a6_winsorized_stats",
    oracle="""
    WITH q AS (
      SELECT o_orderstatus,
             quantile_cont(o_totalprice, 0.05) AS q05,
             quantile_cont(o_totalprice, 0.95) AS q95
      FROM orders GROUP BY o_orderstatus
    )
    SELECT o.o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CASE WHEN o.o_totalprice < q.q05 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clipped_low,
           CAST(SUM(CASE WHEN o.o_totalprice > q.q95 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clipped_high,
           CAST(ROUND(SUM(CAST(LEAST(GREATEST(o.o_totalprice, q.q05), q.q95)
                              AS DECIMAL(12,4))) / COUNT(*), 2) AS DOUBLE)
             AS winsorized_mean
    FROM orders o JOIN q USING (o_orderstatus)
    GROUP BY o.o_orderstatus
    """,
)
def a6_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_orderstatus", "o_totalprice")
    q = o.groupBy("o_orderstatus").agg(
        F.expr("percentile(o_totalprice, 0.05)").alias("q05"),
        F.expr("percentile(o_totalprice, 0.95)").alias("q95"),
    )
    clipped = F.least(F.greatest(F.col("o_totalprice"), F.col("q05")), F.col("q95"))
    return (
        o.join(F.broadcast(q), "o_orderstatus")
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.when(F.col("o_totalprice") < F.col("q05"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_clipped_low"),
            F.sum(F.when(F.col("o_totalprice") > F.col("q95"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_clipped_high"),
            F.round(F.sum(clipped.cast("decimal(12,4)")) / F.count("*"), 2)
            .cast("double")
            .alias("winsorized_mean"),
        )
    )


# ---------------------------------------------------------------------------
# P8: group-mean imputation — the missing-value repair transform of a
# feature pipeline, with "missing" = the sentinel class the reference's
# refToNullable/zero-date rules model (here: negative balances). The
# per-segment mean of the VALID values is a |segments|-row aggregate
# broadcast back over the corpus; the imputed flag keeps the repair
# auditable, and the join is LEFT so a segment with NO valid values
# surfaces its rows with a NULL fill (an auditable gap) instead of
# silently deleting them. Decimal mean, exact in both engines.
# ---------------------------------------------------------------------------
@query(
    "p8_impute_group_mean",
    oracle="""
    WITH m AS (
      SELECT c_mktsegment,
             CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(12,4)))
                        / COUNT(*), 2) AS DOUBLE) AS seg_mean
      FROM customer WHERE c_acctbal >= 0
      GROUP BY c_mktsegment
    )
    SELECT c.c_custkey,
           c.c_mktsegment,
           (c.c_acctbal < 0) AS was_imputed,
           CASE WHEN c.c_acctbal < 0 THEN m.seg_mean
                ELSE CAST(ROUND(CAST(c.c_acctbal AS DECIMAL(12,4)), 2) AS DOUBLE)
           END AS acctbal_filled
    FROM customer c LEFT JOIN m USING (c_mktsegment)
    """,
)
def p8_impute_group_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    m = (
        c.filter(F.col("c_acctbal") >= 0)
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.sum(F.col("c_acctbal").cast("decimal(12,4)")) / F.count("*"), 2)
            .cast("double")
            .alias("seg_mean")
        )
    )
    missing = F.col("c_acctbal") < 0
    return c.join(F.broadcast(m), "c_mktsegment", "left").select(
        "c_custkey",
        "c_mktsegment",
        missing.alias("was_imputed"),
        F.when(missing, F.col("seg_mean"))
        .otherwise(F.round(F.col("c_acctbal").cast("decimal(12,4)"), 2).cast("double"))
        .alias("acctbal_filled"),
    )


# ---------------------------------------------------------------------------
# QUEUED (r14+ registration per the window budget): small-file
# compaction planning (o7) — the table-maintenance step every
# partitioned lake table needs: given a file inventory (simulated here
# as one "file" per (l_returnflag, l_linestatus, ship-day) with
# bytes = rows x 120), assign consecutive files within each partition
# to compaction groups by OFFSET BINNING — group = (starting byte
# offset) div target — which is exactly Spark's own FilePartition
# packing rule (spark.sql.files.maxPartitionBytes): deterministic,
# shuffle-free to compute, and within one file of optimal for the
# monotone-offsets case, unlike greedy first-fit (which needs a
# sequential scan and gains nothing at compaction granularity).
#
# Scale shape: ONE (partition, day) hash agg with map-side combine is
# the only corpus-sized work (output O(partitions x days) — the file
# inventory, which at a real lake comes free from the table manifest);
# the pack window and group rollup run on that inventory frame. Every
# number is BIGINT arithmetic — integer-exact cross-engine.
#
# r13 verification record (the queue contract): DuckDB-exact +
# driver-hash-OK under a vanilla session at sf0.001 (6 groups: every
# partition fits one), sf0.01 (60), sf0.1 (552); packing invariants
# pinned against a pure-python offset-binning replay (groups partition
# the inventory exactly, group offsets bin correctly, non-final groups
# straddle their bin boundary); 5x lineitem replica probe: wall FLAT
# (x0.9 at x5 rows with x5 groups — the map-side-combined inventory agg
# is the only corpus work); first 7-rep interleaved median 1.107 s at
# sf0.1 (loadavg 1.5; the control read 1.7x its floor in the same reps,
# so this floor may be slightly generous — the samples themselves were
# stable at 0.89-1.24 s).
# ---------------------------------------------------------------------------
_O7_ROW_BYTES = 120
_O7_TARGET = 131072  # 128 KiB at bench scale; a lake passes 128 MiB


_ORACLE_COMPACTION = f"""
    WITH files AS (
      SELECT l_returnflag, l_linestatus,
             (CAST(FLOOR(EPOCH(l_shipdate)) AS BIGINT) // 86400) AS day,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(*) * {_O7_ROW_BYTES} AS BIGINT) AS bytes
      FROM lineitem GROUP BY 1, 2, 3
    ),
    packed AS (
      SELECT *, CAST(SUM(bytes) OVER (
               PARTITION BY l_returnflag, l_linestatus
               ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      FROM files
    )
    SELECT l_returnflag, l_linestatus,
           CAST((cum - bytes) // {_O7_TARGET} AS BIGINT) AS file_group,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(n_rows) AS BIGINT) AS n_rows,
           CAST(SUM(bytes) AS BIGINT) AS group_bytes
    FROM packed
    GROUP BY 1, 2, 3
"""


@query("o7_compaction_plan", oracle=_ORACLE_COMPACTION)
def o7_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset-binned compaction groups over the simulated file
    inventory — see the block above."""
    from pyspark.sql.window import Window as _W

    from mysql2psql_spark.operators.timeutil import epoch_of

    li = load_table(spark, sf_dir, "lineitem")
    ep = epoch_of(li, "l_shipdate")
    files = (
        li.select("l_returnflag", "l_linestatus", ep("l_shipdate").alias("_e"))
        .select(
            "l_returnflag", "l_linestatus", F.expr("_e div 86400").alias("day")
        )
        .groupBy("l_returnflag", "l_linestatus", "day")
        .agg(F.count("*").cast("bigint").alias("n_rows"))
        .withColumn("bytes", (F.col("n_rows") * _O7_ROW_BYTES).cast("bigint"))
    )
    w = (
        _W.partitionBy("l_returnflag", "l_linestatus")
        .orderBy("day")
        .rowsBetween(_W.unboundedPreceding, _W.currentRow)
    )
    packed = files.withColumn("cum", F.sum("bytes").over(w).cast("bigint"))
    grp = F.expr(f"(cum - bytes) div {_O7_TARGET}").cast("bigint")
    return (
        packed.withColumn("file_group", grp)
        .groupBy("l_returnflag", "l_linestatus", "file_group")
        .agg(
            F.count("*").cast("bigint").alias("n_files"),
            F.sum("n_rows").cast("bigint").alias("n_rows"),
            F.sum("bytes").cast("bigint").alias("group_bytes"),
        )
    )
