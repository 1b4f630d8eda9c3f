"""Multi-way join analytics (TPC-H Q3/Q4/Q5 shapes over the star schema).

Extension surface: the reference only ever joins to filter extraction
(J1, SURVEY.md §2.3); these pin the join-planning behavior a real
analytics engine needs at 100 TB — broadcast of small dimensions, semi
joins instead of EXISTS subqueries, and aggregation above a multi-way
join where only the fact table is large. Money math follows the
engine-wide decimal-then-round rule (queries/core.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql2psql_spark.queries import query
from mysql2psql_spark.sources import load_table


def _dec(c: str) -> Column:
    return F.col(c).cast("decimal(12,4)")


_REVENUE_SQL = "SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l_discount AS DECIMAL(12,4))))"


def _revenue() -> Column:
    return F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))


def _money(col: Column) -> Column:
    return F.round(col, 2).cast("double")


# ---------------------------------------------------------------------------
# Q3 shape: shipping-priority top-k. Fact-fact join (orders x lineitem)
# shuffles on the join key; the customer filter broadcasts. Top-10 is
# TakeOrderedAndProject — no global sort materializes.
# ---------------------------------------------------------------------------
@query(
    "q03_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           CAST(ROUND({_REVENUE_SQL}, 2) AS DOUBLE) AS revenue,
           STRFTIME(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1997-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
# Broadcast-hint policy (r12): hints stay ONLY on frames bounded by
# construction (nation 25 rows, region 5, literal maps, 1-row aggs).
# customer/part/supplier and their derivatives SCALE with SF, and a
# user hint FORCES broadcast at any size (AQE demotes only its own
# decisions, never hints) — at bench scale the planner already picks
# BHJ for these from parquet size estimates (plans verified identical
# hint vs no-hint at sf0.01 and sf0.1), and at 100 TB it correctly
# shuffles, with AQE converting back to broadcast at runtime when the
# filtered side turns out small.
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cut = F.to_timestamp(F.lit("1997-03-15 00:00:00"))
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cut)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cut)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(_money(_revenue()).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q4 shape: EXISTS subquery expressed as a LEFT SEMI join (the Spark-native
# decorrelation) — orders with at least one late-shipped lineitem, counted
# by priority.
# ---------------------------------------------------------------------------
@query(
    "q04_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1997-01-01 00:00:00")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01 00:00:00")))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (li.l_orderkey == orders.o_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


# ---------------------------------------------------------------------------
# Q5 shape: local-supplier volume — 6-table join where everything but
# (orders, lineitem) is a broadcast-able dimension; the c_nationkey =
# s_nationkey equality rides on the join, not a post-filter.
# ---------------------------------------------------------------------------
@query(
    "q05_local_supplier_volume",
    oracle=f"""
    SELECT n_name, CAST(ROUND({_REVENUE_SQL}, 2) AS DOUBLE) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q05_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    asia_nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1997-01-01 00:00:00")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01 00:00:00")))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders.select("o_orderkey", "o_custkey"), li.l_orderkey == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == customer.c_custkey)
        .join(
            supplier,
            (li.l_suppkey == supplier.s_suppkey)
            & (F.col("c_nationkey") == supplier.s_nationkey),
        )
        .join(F.broadcast(asia_nations), supplier.s_nationkey == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(_money(_revenue()).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q6 shape: forecasting revenue change — pure scan + filter + single
# aggregate. The whole query collapses to one codegen'd pass over the
# pushed-down scan range (no shuffle beyond the final 1-row combine).
# ---------------------------------------------------------------------------
@query(
    "q06_forecast_revenue",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                           * CAST(l_discount AS DECIMAL(12,4))), 2) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.02 AND 0.04
      AND l_quantity < 24
    """,
)
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01 00:00:00")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01 00:00:00")))
            & (F.col("l_discount").between(0.02, 0.04))
            & (F.col("l_quantity") < 24)
        )
        .agg(_money(F.sum(_dec("l_extendedprice") * _dec("l_discount"))).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q10 shape: returned-item ranking — fact join + customer/nation broadcast,
# revenue per customer, top 20.
# ---------------------------------------------------------------------------
@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           CAST(ROUND({_REVENUE_SQL}, 2) AS DOUBLE) AS revenue
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
      AND l_returnflag = 'R' AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1997-01-01 00:00:00")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-07-01 00:00:00")))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders.select("o_orderkey", "o_custkey"), li.l_orderkey == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(_money(_revenue()).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Range join (binned): lineitem ship dates into deterministic 7-day promo
# windows (first week of each quarter, 1997-1998). The oracle states the
# plain inequality join; the engine's binned equi-join shape is linear
# and survives interval tables far too large to broadcast
# (operators/rangejoin.py).
# ---------------------------------------------------------------------------
_PROMO_WINDOWS = [
    (f"{y}-{m:02d}", f"{y}-{m:02d}-01 00:00:00", f"{y}-{m:02d}-08 00:00:00")
    for y in (1997, 1998)
    for m in (1, 4, 7, 10)
]
_PROMO_VALUES = ", ".join(
    f"('{w}', TIMESTAMP '{s}', TIMESTAMP '{e}')" for w, s, e in _PROMO_WINDOWS
)


@query(
    "r1_range_join_promo",
    oracle=f"""
    WITH promo(window_id, w_start, w_end) AS (VALUES {_PROMO_VALUES})
    SELECT p.window_id, COUNT(*) AS n_lines,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,4))), 2) AS DOUBLE) AS volume
    FROM lineitem l JOIN promo p
      ON l.l_shipdate >= p.w_start AND l.l_shipdate < p.w_end
    GROUP BY p.window_id
    """,
)
def r1_range_join_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mysql2psql_spark.operators.rangejoin import binned_range_join

    li = load_table(spark, sf_dir, "lineitem").select("l_shipdate", "l_extendedprice")
    promo = spark.createDataFrame(
        [(w, s, e) for w, s, e in _PROMO_WINDOWS],
        "window_id string, w_start string, w_end string",
    ).select(
        "window_id",
        F.to_timestamp("w_start").alias("w_start"),
        F.to_timestamp("w_end").alias("w_end"),
    )
    # promo is 8 rows: pass broadcast_intervals=True explicitly to pin
    # the broadcast AND skip the default "auto" mode's exploded-size
    # planning count (the auto gate is for callers whose interval table
    # might outgrow a broadcast; here the size is known by construction).
    joined = binned_range_join(
        li, promo, "l_shipdate", "w_start", "w_end", broadcast_intervals=True
    )
    return joined.groupBy("window_id").agg(
        F.count("*").alias("n_lines"),
        _money(F.sum(_dec("l_extendedprice"))).alias("volume"),
    )


# ---------------------------------------------------------------------------
# Q14 shape: promotion revenue share — conditional aggregation above a
# fact-dim join; one number out, so the join shuffle is the whole cost.
# ---------------------------------------------------------------------------
@query(
    "q14_promo_effect",
    oracle="""
    SELECT ROUND(
             100.0 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                        THEN CAST(l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l_discount AS DECIMAL(12,4)))
                        ELSE 0 END) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l_discount AS DECIMAL(12,4)))) AS DOUBLE),
           6) AS promo_revenue_pct
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
    """,
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-09-01 00:00:00")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-10-01 00:00:00")))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(F.lit(0).cast("decimal(12,4)"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.lit(100.0) * F.sum(promo).cast("double") / F.sum(rev).cast("double"), 6
            ).alias("promo_revenue_pct")
        )
    )


# ---------------------------------------------------------------------------
# Q18 shape: large-volume orders — aggregate + HAVING feeding a semi join
# back into the fact (the group-filter-then-rejoin pattern).
# ---------------------------------------------------------------------------
@query(
    "q18_large_orders",
    oracle="""
    SELECT c_name, o_orderkey,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,4))), 2) AS DOUBLE) AS total_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(12,4))) > 150
      )
      AND c_custkey = o_custkey AND o_orderkey = l_orderkey
    GROUP BY c_name, o_orderkey
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 20
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The HAVING sum IS the output sum: SUM(l_quantity) per order serves
    # both the >150 filter and total_qty, because the final GROUP BY
    # (c_name, o_orderkey) has one row per order (o_orderkey is unique
    # in orders; c_name is functionally determined by it). One lineitem
    # scan + one order-keyed shuffle, instead of the textbook plan's two
    # full scans and two aggregations of the fact table — at 100 TB the
    # saved pass is the whole cost of the query. The filtered agg is
    # NOT broadcast-pinned: >150 keeps ~20% of orders (29k at sf0.1),
    # so the filtered agg scales with the fact table — AQE may broadcast
    # it while it fits, but pinning would OOM at 100 TB.
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("q"))
        .filter(F.col("q") > 150)
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .select("c_name", "o_orderkey", _money(F.col("q")).alias("total_qty"))
        .orderBy(F.col("total_qty").desc(), "o_orderkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q19 shape: disjunctive multi-predicate join — OR-of-ANDs conditions that
# must stay inside the join (Catalyst extracts the common p_partkey
# equi-key so the plan is still a hash join, not a nested loop).
# ---------------------------------------------------------------------------
@query(
    "q19_disjunctive_filters",
    oracle="""
    SELECT COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l_discount AS DECIMAL(12,4)))), 2) AS DOUBLE) AS revenue
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 5)
        OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 20))
    """,
)
def q19_disjunctive_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    cond = (li.l_partkey == part.p_partkey) & (
        ((part.p_brand == "Brand#1") & part.p_size.between(1, 15) & (li.l_quantity >= 5))
        | ((part.p_brand == "Brand#3") & part.p_size.between(10, 30) & (li.l_quantity >= 20))
    )
    rev = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return li.join(part, cond).agg(
        F.count("*").alias("n"), _money(F.sum(rev)).alias("revenue")
    )
