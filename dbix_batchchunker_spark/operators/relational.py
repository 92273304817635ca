"""Relational surface (SURVEY.md §2.B): the SQL the reference assumes of its
backing database — scans, projection, filters (=, BETWEEN, !=, IN), MIN/MAX/
COUNT aggregates, equi-joins & join paths, group-by, views, ordering — all
expressed declaratively so Catalyst handles pushdown, pruning, join
strategy (broadcast for the small dims), and whole-stage codegen.

Evidence anchors in the reference: t/dbh.t:114-115 (projection + equality +
BETWEEN), BatchChunker.pm:121-130 (UPDATE…JOIN and != predicates),
t/dbic.t:358 (IN), t/dbh.t:59-60 (MIN/MAX/COUNT), t/one-many.t:30 (join-path
traversal), t/lib/sqlite.sql:136-137 (filtered view).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import dec2, epoch_us, one_minus, one_plus, query, t

# All money arithmetic stays in DECIMAL from the base columns up (see
# registry.dec2): exact and order-independent in both Spark and DuckDB.
# FINAL outputs are cast to DOUBLE on both sides: DuckDB's .df() hands
# DECIMAL/HUGEINT sums to pandas as float64 while Spark hands Decimal/int64
# objects, so a decimal-typed output hash-mismatches even when values are
# identical. The exact decimal total rounds to the same nearest-double in
# both engines, so DOUBLE is the cross-engine-stable output type.
_OUT = "double"  # final sums cast to this on both sides (gate-stable dtype)


# --------------------------------------------------------------------------- #
# q01: pricing summary (TPC-H Q1 shape) — groupBy aggregate over lineitem     #
# --------------------------------------------------------------------------- #
@query(
    "q01_pricing_summary",
    oracle="""
    SELECT
        l_returnflag,
        l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
                 * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
        ROUND(AVG(l_quantity), 4) AS avg_qty,
        COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    disc_price = dec2("l_extendedprice") * one_minus("l_discount")
    charge = dec2("l_extendedprice") * one_minus("l_discount") * one_plus("l_tax")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec2("l_quantity")).cast(_OUT).alias("sum_qty"),
            F.sum(dec2("l_extendedprice")).cast(_OUT).alias("sum_base_price"),
            F.sum(disc_price).cast(_OUT).alias("sum_disc_price"),
            F.sum(charge).cast(_OUT).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------- #
# q02: projection + predicate zoo (=, BETWEEN, !=, IN) — pushdown showcase    #
# --------------------------------------------------------------------------- #
@query(
    "q02_filter_predicates",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20
      AND l_returnflag <> 'A'
      AND l_linenumber IN (1, 2)
      AND l_linestatus = 'F'
    """,
)
def q02_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(10, 20)
        & (F.col("l_returnflag") != "A")
        & F.col("l_linenumber").isin(1, 2)
        & (F.col("l_linestatus") == "F")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")


# --------------------------------------------------------------------------- #
# q03: join-path traversal + aggregate — revenue per nation                   #
# (lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region; small dims broadcast)      #
# --------------------------------------------------------------------------- #
@query(
    "q03_revenue_by_nation",
    oracle="""
    SELECT
        n.n_name,
        CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                 * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
        COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey = c.c_custkey
    JOIN nation n    ON c.c_nationkey = n.n_nationkey
    JOIN region r    ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA' AND o.o_orderdate >= TIMESTAMP '1995-01-01'
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
)
def q03_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp")
    )
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = dec2("l_extendedprice") * one_minus("l_discount")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(revenue).cast(_OUT).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("n_name")
    )


# --------------------------------------------------------------------------- #
# q04: min/max/count range scan (operator A1/A3 as a query)                   #
# --------------------------------------------------------------------------- #
@query(
    "q04_minmax_count",
    oracle="""
    SELECT MIN(o_orderkey) AS min_id, MAX(o_orderkey) AS max_id,
           COUNT(*) AS n_rows, COUNT(DISTINCT o_custkey) AS n_customers
    FROM orders
    """,
)
def q04_minmax_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "orders").agg(
        F.min("o_orderkey").alias("min_id"),
        F.max("o_orderkey").alias("max_id"),
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


# --------------------------------------------------------------------------- #
# q05: group-by count + HAVING                                                #
# --------------------------------------------------------------------------- #
@query(
    "q05_groupby_having",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE o_orderstatus <> 'F'
    GROUP BY o_orderpriority
    HAVING COUNT(*) > 10
    ORDER BY o_orderpriority
    """,
)
def q05_groupby_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") != "F")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") > 10)
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------- #
# q06: view over filtered projection (year2000cds analog,                     #
# t/lib/sqlite.sql:136-137) — temp view + spark.sql                           #
# --------------------------------------------------------------------------- #
@query(
    "q06_view_orders_1995",
    oracle="""
    WITH orders_1995 AS (
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate <  TIMESTAMP '1996-01-01'
    )
    SELECT o_custkey,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_spent
    FROM orders_1995
    GROUP BY o_custkey
    HAVING COUNT(*) >= 3
    ORDER BY o_custkey
    """,
)
def q06_view_orders_1995(spark: SparkSession, sf_dir: str) -> DataFrame:
    t(spark, sf_dir, "orders").createOrReplaceTempView("__orders_q06")
    spark.sql(
        """
        CREATE OR REPLACE TEMP VIEW orders_1995 AS
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM __orders_q06
        WHERE o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate <  TIMESTAMP '1996-01-01'
        """
    )
    return spark.sql(
        """
        SELECT o_custkey,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_spent
        FROM orders_1995
        GROUP BY o_custkey
        HAVING COUNT(*) >= 3
        ORDER BY o_custkey
        """
    )


# --------------------------------------------------------------------------- #
# q07: top-k with deterministic tie-break                                      #
# --------------------------------------------------------------------------- #
@query(
    "q07_top_customers",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_spent,
           COUNT(*) AS n_orders
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    ORDER BY total_spent DESC, c_custkey ASC
    LIMIT 10
    """,
)
def q07_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.sum(dec2("o_totalprice")).cast(_OUT).alias("total_spent"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(F.col("total_spent").desc(), F.col("c_custkey").asc())
        .limit(10)
    )


# --------------------------------------------------------------------------- #
# q08: window function — latest event per user                                #
# --------------------------------------------------------------------------- #
@query(
    "q08_latest_event_per_user",
    oracle="""
    SELECT user_id, event_id, ts, event_type
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def q08_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type")
    )


# --------------------------------------------------------------------------- #
# q09: semi/anti joins (EXISTS / NOT EXISTS shapes)                           #
# --------------------------------------------------------------------------- #
@query(
    "q09_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q09_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


# --------------------------------------------------------------------------- #
# q10: set operations                                                          #
# --------------------------------------------------------------------------- #
@query(
    "q10_set_ops",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_totalprice > 400000
    """,
)
def q10_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    open_cust = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    filled_cust = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    big_cust = orders.filter(F.col("o_totalprice") > 400000).select("o_custkey")
    # subtract() IS set-semantics EXCEPT, matching the oracle directly
    # (intersect() already dedups its output, so no trailing distinct needed)
    return open_cust.intersect(filled_cust).subtract(big_cust)


# --------------------------------------------------------------------------- #
# q11: tumbling time-window aggregation (batch form of the streaming op)      #
# --------------------------------------------------------------------------- #
@query(
    "q11_hourly_event_rollup",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour_bucket,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def q11_hourly_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    # Hour truncation in the EPOCH-µS domain, not date_trunc: Spark's
    # date_trunc promotes TIMESTAMP_NTZ through the SESSION timezone, so a
    # non-UTC gate session would shift every hour label (the only
    # tz-sensitive query found by a full replica sweep under
    # America/New_York). Floor the µs to the hour and rebuild an NTZ value —
    # wall-clock arithmetic only, identical under any session timezone and
    # for both physical ts forms (epoch_us handles each).
    ev = ev.withColumn("__us", epoch_us(ev))
    # Floor (not truncate-toward-zero) division: `div` would round a
    # pre-1970 negative-epoch µs UP to the next hour, diverging from
    # date_trunc. The double-mod form floors for any sign without leaving
    # the int64 domain (floor(__us/3.6e9) via DOUBLE loses µs precision
    # past 2**53).
    hour_bucket = F.expr(
        "timestampadd(MICROSECOND, "
        "__us - ((__us % 3600000000) + 3600000000) % 3600000000, "
        "TIMESTAMP_NTZ '1970-01-01 00:00:00')"
    )
    return (
        ev.groupBy(
            hour_bucket.alias("hour_bucket"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec2("value")).cast(_OUT).alias("total_value"),
        )
        .orderBy("hour_bucket", "event_type")
    )
