"""Gated queries: the general relational surface over the TPC-H-ish
tables — equi joins with broadcast dims, semi/anti joins, unions,
analytic windows — plus presentation-function rendering.

pmacct itself has no user-facing relational joins (SURVEY.md §2.4), so
these prove the Spark-first engine supersedes the reference: the same
DataFrame layer that runs pmacct channels composes with arbitrary
relational analytics.

Money columns are doubles generated at 2 decimal places; oracles and
Spark both aggregate them as exact integer cents (ROUND(x*100) ->
BIGINT) so sums are order-independent and hash-stable.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pmacct_spark.driver_queries import FLOWS_DUCK_CTE, flows, register
from pmacct_spark.functions.presentation import (
    proto_name,
    proto_name_sql,
    tcp_flags_str,
    tcp_flags_str_sql,
)
from pmacct_spark.sources.tables import load_table

_CENTS = "CAST(SUM(CAST(ROUND({c} * 100) AS BIGINT)) AS BIGINT)"


def _cents(col: str) -> F.Column:
    return F.sum(F.round(F.col(col) * 100).cast("bigint")).alias(f"{col}_cents")


# --- TPC-H Q1-shaped pricing summary over lineitem
@register(
    "tpch_q1_pricing",
    f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       {_CENTS.format(c='l_extendedprice')} AS l_extendedprice_cents,
       {_CENTS.format(c='l_extendedprice * (1 - l_discount)')} AS disc_price_cents,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2024-11-01 00:00:00'
GROUP BY 1, 2""",
)
def tpch_q1_pricing(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2024-11-01 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias(
                "l_extendedprice_cents"
            ),
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
                    "bigint"
                )
            ).alias("disc_price_cents"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --- star join: orders x customer (AQE) x nation (broadcast hint)
@register(
    "join_revenue_by_nation",
    f"""
SELECT n.n_name AS nation, o.o_orderpriority,
       {_CENTS.format(c='o.o_totalprice')} AS revenue_cents,
       COUNT(*) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY 1, 2""",
)
def join_revenue_by_nation(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), "o_orderpriority")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
                "revenue_cents"
            ),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


# --- 3-way fact join with dim filters (Q3-shaped)
@register(
    "join_lineitem_orders_filtered",
    f"""
SELECT o.o_orderkey, o.o_orderdate,
       {_CENTS.format(c='l.l_extendedprice * (1 - l.l_discount)')} AS revenue_cents
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY 1, 2
ORDER BY revenue_cents DESC, o_orderkey ASC LIMIT 20""",
)
def join_lineitem_orders_filtered(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                ).cast("bigint")
            ).alias("revenue_cents")
        )
        .orderBy(F.desc("revenue_cents"), F.asc("o_orderkey"))
        .limit(20)
    )


# --- semi join: suppliers that ship any part > size 40
@register(
    "semi_join_suppliers",
    """
SELECT s.s_suppkey, s.s_name FROM supplier s
WHERE EXISTS (
  SELECT 1 FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE l.l_suppkey = s.s_suppkey AND p.p_size > 40
)""",
)
def semi_join_suppliers(spark, sf_dir):
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") > 40)
    # part is SF-linear: no forced broadcast — AQE picks the strategy
    # from runtime sizes (broadcasts at small SF, shuffles at 100 TB).
    shippers = li.join(p, li.l_partkey == p.p_partkey).select("l_suppkey")
    return s.join(
        shippers, s.s_suppkey == shippers.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name")


# --- anti join: parts never shipped in bulk (quantity >= 45) — the
#     predicate keeps the result non-empty at every scale factor so the
#     value-hash check is meaningful
@register(
    "anti_join_parts_never_shipped",
    """
SELECT p.p_partkey, p.p_brand FROM part p
WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 45)""",
)
def anti_join_parts_never_shipped(spark, sf_dir):
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").filter("l_quantity >= 45")
    return p.join(li, p.p_partkey == li.l_partkey, "left_anti").select(
        "p_partkey", "p_brand"
    )


# --- union of sources (nfacctd mixes v5+v9+IPFIX exporters into one
#     stream, reference src/nfacctd.c:1649-1654): two event slices union
@register(
    "union_event_sources",
    """
SELECT event_type, COUNT(*) AS n, CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS value_c
FROM (
  SELECT event_type, value FROM events WHERE user_id % 2 = 0
  UNION ALL
  SELECT event_type, value FROM events WHERE user_id % 2 = 1
) GROUP BY 1""",
)
def union_event_sources(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter("user_id % 2 = 0").select("event_type", "value")
    b = ev.filter("user_id % 2 = 1").select("event_type", "value")
    return (
        a.unionByName(b)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("value") * 100).cast("bigint")).alias("value_c"),
        )
    )


# --- analytic window functions (absent in the reference, §2.7 — free
#     on Spark): rank users by value within event_type
@register(
    "window_rank_users",
    """
SELECT event_type, user_id, value_c, rnk FROM (
  SELECT event_type, user_id, value_c,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value_c DESC, user_id ASC) AS rnk
  FROM (
    SELECT event_type, user_id,
           CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS value_c
    FROM events GROUP BY 1, 2
  )
) WHERE rnk <= 5""",
)
def window_rank_users(spark, sf_dir):
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.sum(F.floor(F.col("value") * 100).cast("bigint")).alias("value_c")
    )
    w = Window.partitionBy("event_type").orderBy(
        F.desc("value_c"), F.asc("user_id")
    )
    return (
        per_user.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("event_type", "user_id", "value_c", "rnk")
    )


# --- presentation rendering: proto names + tcp-flag strings
@register(
    "presentation_render",
    f"""{FLOWS_DUCK_CTE}
SELECT {proto_name_sql('ip_proto')} AS proto,
       {tcp_flags_str_sql('flags_or')} AS tcp_flags,
       bytes
FROM (
  SELECT ip_proto, bit_or(tcp_flags) AS flags_or,
         CAST(SUM(bytes) AS BIGINT) AS bytes
  FROM flows GROUP BY ip_proto
)""",
)
def presentation_render(spark, sf_dir):
    f = flows(spark, sf_dir)
    agg = f.groupBy("ip_proto").agg(
        F.bit_or("tcp_flags").alias("flags_or"),
        F.sum("bytes").alias("bytes"),
    )
    return agg.select(
        proto_name("ip_proto").alias("proto"),
        tcp_flags_str("flags_or").alias("tcp_flags"),
        "bytes",
    )


# --- TPC-H Q5-shaped: six-way join with the s_nationkey = c_nationkey
#     "local supplier" equality, region-filtered. Fixed-size dims
#     (nation, region) broadcast-hinted; SF-linear dims (customer,
#     supplier) are left to AQE so the plan survives a 100× scale-up.
@register(
    "tpch_q5_local_supplier",
    f"""
SELECT n.n_name AS nation,
       {_CENTS.format(c='l.l_extendedprice * (1 - l.l_discount)')} AS revenue_cents
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
             AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1""",
)
def tpch_q5_local_supplier(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        # customer/supplier are SF-linear: no forced broadcast (a forced
        # hint OOMs executors at the 100 TB design point); AQE converts
        # these to broadcast joins at small SF from runtime statistics.
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                ).cast("bigint")
            ).alias("revenue_cents")
        )
    )


# --- TPC-H Q6-shaped: pure scan-filter-aggregate — the pushdown
#     showcase (every predicate reaches the parquet scan; grand total =
#     one partial+final agg, no wide shuffle).
@register(
    "tpch_q6_forecast_revenue",
    f"""
SELECT {_CENTS.format(c='l_extendedprice * l_discount')} AS revenue_cents,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24""",
)
def tpch_q6_forecast_revenue(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * F.col("l_discount") * 100).cast(
                    "bigint"
                )
            ).alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --- TPC-H Q3-shaped: selective dim filter -> fact join -> top-N by
#     aggregate (the classic shipping-priority plan: filtered customer
#     dim joined under AQE, one groupBy shuffle, global top-10 via
#     TakeOrderedAndProject — no full sort).
@register(
    "tpch_q3_shipping_priority",
    f"""
SELECT l.l_orderkey,
       {_CENTS.format(c='l.l_extendedprice * (1 - l.l_discount)')} AS revenue_cents,
       o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1997-06-15 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1997-06-15 00:00:00'
GROUP BY 1, 3, 4
ORDER BY revenue_cents DESC, o_orderdate, l_orderkey LIMIT 10""",
)
def tpch_q3_shipping_priority(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-06-15 00:00:00").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-06-15 00:00:00").cast("timestamp_ntz")
    )
    return (
        # filtered customer is still SF-linear (~1/5 of the table): let
        # AQE choose broadcast from measured size instead of forcing it.
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                ).cast("bigint")
            ).alias("revenue_cents")
        )
        .select("l_orderkey", "revenue_cents", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue_cents"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


# --- TPC-H Q18-shaped: aggregate-filtered semi join (large orders) —
#     the HAVING-subquery shape: the qualifying-order set is computed
#     with one groupBy and joined back; AQE broadcasts it while it
#     fits and degrades to a shuffle join when it grows with SF.
@register(
    "tpch_q18_large_orders",
    """
WITH big AS (
  SELECT l_orderkey FROM lineitem GROUP BY 1 HAVING SUM(l_quantity) > 270
)
SELECT c.c_name, o.o_orderkey, o.o_orderdate,
       CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS totalprice_cents,
       CAST(SUM(l.l_quantity) AS BIGINT) AS sum_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
GROUP BY 1, 2, 3, 4""",
)
def tpch_q18_large_orders(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__q"))
        .filter("__q > 270")
        .select("l_orderkey")
    )
    return (
        # `big` (qualifying orders) and customer grow with SF — no
        # forced broadcast; AQE broadcasts them while they fit.
        li.join(big, "l_orderkey")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            "c_name", "o_orderkey", "o_orderdate",
            F.round(F.col("o_totalprice") * 100)
            .cast("bigint")
            .alias("totalprice_cents"),
        )
        .agg(F.sum("l_quantity").cast("bigint").alias("sum_qty"))
    )


# --- TPC-H Q10-shaped: returned-item revenue by customer — selective
#     fact filter, nation broadcast-hinted, customer under AQE, one
#     groupBy shuffle, global top-20 via TakeOrderedAndProject.
@register(
    "tpch_q10_returned_items",
    f"""
SELECT c.c_custkey, c.c_name, n.n_name AS nation,
       {_CENTS.format(c='l.l_extendedprice * (1 - l.l_discount)')} AS revenue_cents
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
GROUP BY 1, 2, 3
ORDER BY revenue_cents DESC, c_custkey LIMIT 20""",
)
def tpch_q10_returned_items(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp_ntz"))
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        # customer is SF-linear: hint only the fixed-size nation dim.
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                ).cast("bigint")
            ).alias("revenue_cents")
        )
        .select("c_custkey", "c_name", "nation", "revenue_cents")
        .orderBy(F.desc("revenue_cents"), "c_custkey")
        .limit(20)
    )


# --- TPC-H Q12-shaped: conditional-count aggregation (CASE buckets
#     inside SUM) over a pure scan filter — zero joins, one shuffle.
@register(
    "tpch_q12_priority_by_status",
    """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1""",
)
def tpch_q12_priority_by_status(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("bigint").alias(
                "high_line_count"
            ),
            F.sum(F.when(~hi, 1).otherwise(0)).cast("bigint").alias(
                "low_line_count"
            ),
        )
    )


# --- TPC-H Q14-shaped: conditional-revenue ratio over a dim join —
#     part joined under AQE, one scan, CASE inside both SUMs, the ratio
#     as integer per-mille so the oracle hash-matches exactly.
@register(
    "tpch_q14_promo_revenue",
    """
WITH j AS (
  SELECT CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
           AS cents,
         p.p_type LIKE 'PROMO%' AS is_promo
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE l.l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
    AND l.l_shipdate < TIMESTAMP '1997-06-01 00:00:00'
)
SELECT CAST(SUM(CASE WHEN is_promo THEN cents ELSE 0 END) * 1000
        // SUM(cents) AS BIGINT) AS promo_pm,
       CAST(SUM(cents) AS BIGINT) AS revenue_cents
FROM j""",
)
def tpch_q14_promo_revenue(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-06-01 00:00:00").cast("timestamp_ntz"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    promo = F.col("p_type").startswith("PROMO")
    return (
        # part is SF-linear: AQE decides broadcast vs shuffle at runtime.
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            F.sum(F.when(promo, cents).otherwise(0)).alias("__p"),
            F.sum(cents).alias("__t"),
        )
        .select(
            F.expr("__p * 1000 DIV __t").cast("bigint").alias("promo_pm"),
            F.col("__t").cast("bigint").alias("revenue_cents"),
        )
    )


# --- TPC-H Q4-shaped: order-priority checking — EXISTS semi join from
#     orders into lineitem (late-shipped), priority histogram. (The
#     classic predicate uses l_commitdate/l_receiptdate; the fixture
#     carries l_shipdate, so "late" = shipped after the order date.)
@register(
    "tpch_q4_order_priority",
    """
SELECT o.o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY 1""",
)
def tpch_q4_order_priority(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate > F.expr("o_orderdate + INTERVAL 60 DAY")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


# --- TPC-H Q7-shaped: volume shipping between two nations — the
#     supplier's and customer's nations on opposite sides of each
#     lineitem, per year. nation broadcast-hinted; customer/supplier
#     under AQE (SF-linear).
@register(
    "tpch_q7_volume_shipping",
    f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(YEAR(l.l_shipdate) AS BIGINT) AS l_year,
       {_CENTS.format(c='l.l_extendedprice * (1 - l.l_discount)')} AS revenue_cents
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
JOIN nation cn ON c.c_nationkey = cn.n_nationkey
WHERE ((sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_8')
    OR (sn.n_name = 'NATION_8' AND cn.n_name = 'NATION_3'))
GROUP BY 1, 2, 3""",
)
def tpch_q7_volume_shipping(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    cn = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_8"))
            | ((F.col("supp_nation") == "NATION_8") & (F.col("cust_nation") == "NATION_3"))
        )
    )
    return j.groupBy(
        "supp_nation", "cust_nation",
        F.year("l_shipdate").cast("bigint").alias("l_year"),
    ).agg(
        F.sum(
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
            .cast("bigint")
        ).alias("revenue_cents")
    )


# --- TPC-H Q13-shaped: customer order-count distribution — LEFT join
#     so zero-order customers count, two-level aggregation.
@register(
    "tpch_q13_customer_distribution",
    """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey
   AND o.o_orderpriority <> '1-URGENT'
  GROUP BY 1
) GROUP BY 1""",
)
def tpch_q13_customer_distribution(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --- TPC-H Q15-shaped: top supplier(s) by quarterly revenue — the
#     revenue "view" + scalar max, ties kept (deterministic by key).
@register(
    "tpch_q15_top_supplier",
    f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         {_CENTS.format(c='l_extendedprice * (1 - l_discount)')} AS total_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY 1)
SELECT s.s_suppkey, s.s_name, r.total_cents
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_cents = (SELECT MAX(total_cents) FROM revenue)""",
)
def tpch_q15_top_supplier(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp_ntz"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
            .cast("bigint")
        ).alias("total_cents")
    )
    from pmacct_spark.operators.staging import stage

    revenue = stage(revenue)  # read twice: scalar max + the join
    # the scalar max rides the plan as a 1-row broadcast cross join —
    # no driver-side action, the whole query stays lazy
    mx = revenue.agg(F.max("total_cents").alias("__mx"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        s.join(revenue, s.s_suppkey == revenue.supplier_no)
        .crossJoin(F.broadcast(mx))
        .filter(F.col("total_cents") == F.col("__mx"))
        .select("s_suppkey", "s_name", "total_cents")
    )


# --- TPC-H Q17-shaped: small-quantity-order revenue — correlated
#     per-part average; exact integer form qty*5*n < sum_qty avoids
#     float thresholds so both engines agree bit-for-bit.
@register(
    "tpch_q17_small_quantity",
    """
WITH pq AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
         COUNT(*) AS n
  FROM lineitem GROUP BY 1)
SELECT CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents,
       COUNT(*) AS n_items
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#23'
JOIN pq ON pq.l_partkey = l.l_partkey
WHERE CAST(l.l_quantity AS BIGINT) * 5 * pq.n < pq.sum_qty""",
)
def tpch_q17_small_quantity(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    pq = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    ).withColumnRenamed("l_partkey", "pq_partkey")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#23"
    ).select("p_partkey")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(pq, li.l_partkey == pq.pq_partkey)
        .filter(F.col("l_quantity").cast("bigint") * 5 * F.col("n") < F.col("sum_qty"))
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias(
                "revenue_cents"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --- TPC-H Q19-shaped: disjunctive predicate groups (brand x size x
#     quantity bands OR'd together) — the filter-pushdown stress shape.
@register(
    "tpch_q19_disjunctive",
    f"""
SELECT {_CENTS.format(c='l.l_extendedprice * (1 - l.l_discount)')} AS revenue_cents,
       COUNT(*) AS n_items
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)""",
)
def tpch_q19_disjunctive(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(p, li.l_partkey == p.p_partkey)
    band = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15)
           & F.col("l_quantity").between(20, 30))
    )
    return j.filter(band).agg(
        F.sum(
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
            .cast("bigint")
        ).alias("revenue_cents"),
        F.count(F.lit(1)).alias("n_items"),
    )


# --- TPC-H Q22-shaped: idle wealthy customers — scalar avg subquery
#     (exact integer cross-multiplication) + anti join to orders.
#     (The classic keys on phone country codes and zero orders; the
#     fixture keys on c_nationkey, and "idle" = no URGENT order —
#     every fixture customer has at least one order.)
@register(
    "tpch_q22_idle_customers",
    """
WITH avgbal AS (
  SELECT CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS s,
         COUNT(*) AS n
  FROM customer WHERE c_acctbal > 0.0)
SELECT c.c_nationkey,
       COUNT(*) AS numcust,
       CAST(SUM(CAST(ROUND(c.c_acctbal * 100) AS BIGINT)) AS BIGINT) AS totacctbal_cents
FROM customer c, avgbal a
WHERE CAST(ROUND(c.c_acctbal * 100) AS BIGINT) * a.n > a.s
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderpriority = '1-URGENT')
GROUP BY 1""",
)
def tpch_q22_idle_customers(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_custkey")
    pos = c.filter(F.col("c_acctbal") > 0.0)
    # 1-row aggregate cross-joined (no driver action): the exact
    # integer cross-multiplication cents*n > s is evaluated per row
    stats = pos.agg(
        F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint")).alias("__s"),
        F.count(F.lit(1)).alias("__n"),
    )
    rich = c.crossJoin(F.broadcast(stats)).filter(
        F.round(F.col("c_acctbal") * 100).cast("bigint") * F.col("__n")
        > F.col("__s")
    )
    idle = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return idle.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint")).alias(
            "totacctbal_cents"
        ),
    )


# --- TPC-H Q2-shaped: minimum-cost supplier — the correlated-min
#     subquery. The fixture has no partsupp table, so the part-supplier
#     relation (and its "supply cost" = cheapest observed line price,
#     exact cents) is derived from lineitem; the correlated min is a
#     per-part window so the part side is scanned once.
@register(
    "tpch_q2_min_cost_supplier",
    """
WITH partsupp AS (
  SELECT l_partkey, l_suppkey,
         CAST(MIN(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS cost_cents
  FROM lineitem GROUP BY 1, 2
),
eligible AS (
  SELECT ps.l_partkey, ps.cost_cents, s.s_name, s.s_acctbal, n.n_name
  FROM partsupp ps
  JOIN supplier s ON ps.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  JOIN part p ON ps.l_partkey = p.p_partkey
  WHERE r.r_name = 'EUROPE' AND p.p_type = 'LARGE'
    AND p.p_size BETWEEN 10 AND 20
),
ranked AS (
  SELECT *, MIN(cost_cents) OVER (PARTITION BY l_partkey) AS min_cost
  FROM eligible
)
SELECT CAST(ROUND(s_acctbal * 100) AS BIGINT) AS s_acctbal_cents,
       s_name, n_name AS nation, l_partkey AS p_partkey, cost_cents
FROM ranked WHERE cost_cents = min_cost
ORDER BY s_acctbal_cents DESC, nation, s_name, p_partkey LIMIT 100""",
)
def tpch_q2_min_cost_supplier(spark, sf_dir):
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias(
            "cost_cents"
        )
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & F.col("p_size").between(10, 20)
    ).select("p_partkey")
    eligible = (
        # supplier/part are SF-linear: AQE picks the join strategy;
        # only the fixed-size nation/region dims are hinted.
        ps.join(s, ps.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(p, ps.l_partkey == p.p_partkey)
        .select("l_partkey", "cost_cents", "s_name", "s_acctbal", "n_name")
    )
    w = Window.partitionBy("l_partkey")
    return (
        eligible.withColumn("min_cost", F.min("cost_cents").over(w))
        .filter(F.col("cost_cents") == F.col("min_cost"))
        .select(
            F.round(F.col("s_acctbal") * 100).cast("bigint").alias(
                "s_acctbal_cents"
            ),
            "s_name",
            F.col("n_name").alias("nation"),
            F.col("l_partkey").alias("p_partkey"),
            "cost_cents",
        )
        .orderBy(F.desc("s_acctbal_cents"), "nation", "s_name", "p_partkey")
        .limit(100)
    )


# --- TPC-H Q8-shaped: national market share — the two-nation-role join
#     (customer's nation filters the market region, supplier's nation is
#     the share numerator), ratio as integer per-mille like Q14.
@register(
    "tpch_q8_market_share",
    """
WITH j AS (
  SELECT CAST(YEAR(o.o_orderdate) AS BIGINT) AS o_year,
         CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
           AS v,
         sn.n_name AS supp_nation
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
  JOIN region r ON cn.n_regionkey = r.r_regionkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE r.r_name = 'AMERICA' AND p.p_type = 'STANDARD'
    AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
)
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN v ELSE 0 END) * 1000
            // SUM(v) AS BIGINT) AS mkt_share_pm,
       CAST(SUM(v) AS BIGINT) AS volume_cents
FROM j GROUP BY 1""",
)
def tpch_q8_market_share(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "STANDARD"
    ).select("p_partkey")
    cn = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region"))
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    v = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
        "bigint"
    )
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == F.col("r_regionkey"))
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(p, li.l_partkey == p.p_partkey)
    )
    return (
        j.groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", v).otherwise(0)
            ).alias("__num"),
            F.sum(v).alias("__den"),
        )
        .select(
            "o_year",
            F.expr("__num * 1000 DIV __den").cast("bigint").alias("mkt_share_pm"),
            F.col("__den").cast("bigint").alias("volume_cents"),
        )
    )


# --- TPC-H Q9-shaped: product-type profit — per-nation-per-year profit
#     where cost uses p_retailprice (the fixture carries no
#     ps_supplycost); amount is exact integer cents on both sides.
@register(
    "tpch_q9_product_profit",
    """
SELECT sn.n_name AS nation,
       CAST(YEAR(o.o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                     AS BIGINT)
                - CAST(ROUND(p.p_retailprice * 100) AS BIGINT)
                  * CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS profit_cents
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_name LIKE '%widget'
GROUP BY 1, 2""",
)
def tpch_q9_product_profit(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").endswith("widget")
    ).select("p_partkey", "p_retailprice")
    amount = (
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
            "bigint"
        )
        - F.round(F.col("p_retailprice") * 100).cast("bigint")
        * F.col("l_quantity").cast("bigint")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(F.sum(amount).cast("bigint").alias("profit_cents"))
    )


# --- TPC-H Q11-shaped: important stock — per-part value share over a
#     region's suppliers with the global-total scalar subquery as a
#     1-row broadcast (exact integer cross-multiplication, like Q22).
@register(
    "tpch_q11_important_stock",
    """
WITH vals AS (
  SELECT l.l_partkey, CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) AS v
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'EUROPE'
),
parts AS (
  SELECT l_partkey, CAST(SUM(v) AS BIGINT) AS value_cents
  FROM vals GROUP BY 1
),
tot AS (SELECT CAST(SUM(value_cents) AS BIGINT) AS t FROM parts)
SELECT p.l_partkey, p.value_cents
FROM parts p, tot WHERE p.value_cents * 2000 > tot.t""",
)
def tpch_q11_important_stock(spark, sf_dir):
    from pmacct_spark.operators.staging import stage

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    vals = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            "l_partkey",
            F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("v"),
        )
    )
    parts = stage(  # read twice: the scalar total + the filter
        vals.groupBy("l_partkey").agg(
            F.sum("v").cast("bigint").alias("value_cents")
        )
    )
    tot = parts.agg(F.sum("value_cents").cast("bigint").alias("__t"))
    return (
        parts.crossJoin(F.broadcast(tot))
        .filter(F.col("value_cents") * 2000 > F.col("__t"))
        .select("l_partkey", "value_cents")
    )


# --- TPC-H Q16-shaped: parts/supplier relationship — distinct-supplier
#     counts per (brand, type, size) with a NOT-IN supplier exclusion
#     (negative account balance stands in for the complaints filter);
#     the part-supplier relation is derived from lineitem.
@register(
    "tpch_q16_supplier_relationship",
    """
WITH rel AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(COUNT(DISTINCT r.l_suppkey) AS BIGINT) AS supplier_cnt
FROM rel r JOIN part p ON r.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#23' AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22, 25)
  AND r.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3""",
)
def tpch_q16_supplier_relationship(spark, sf_dir):
    rel = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#23")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22, 25)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        rel.join(bad, rel.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
    )


# --- TPC-H Q20-shaped: potential part promotion — suppliers holding a
#     dominant share (> 1/4) of a filtered part's annual volume; the
#     availqty comparison becomes an exact integer share test over the
#     lineitem-derived supply relation.
@register(
    "tpch_q20_part_promotion",
    """
WITH qty_sup AS (
  SELECT l_suppkey, l_partkey,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY 1, 2
),
qty_part AS (
  SELECT l_partkey, CAST(SUM(q) AS BIGINT) AS t FROM qty_sup GROUP BY 1
),
dominant AS (
  SELECT DISTINCT qs.l_suppkey
  FROM qty_sup qs
  JOIN qty_part qp ON qs.l_partkey = qp.l_partkey
  JOIN part p ON p.p_partkey = qs.l_partkey
  WHERE p.p_name LIKE 'red %' AND qs.q * 4 > qp.t
)
SELECT s.s_suppkey, s.s_name
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND s.s_suppkey IN (SELECT l_suppkey FROM dominant)""",
)
def tpch_q20_part_promotion(spark, sf_dir):
    from pmacct_spark.operators.staging import stage

    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    qty_sup = stage(  # read twice: per-part totals + the share test
        li.groupBy("l_suppkey", "l_partkey").agg(
            F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("q")
        )
    )
    qty_part = qty_sup.groupBy(F.col("l_partkey").alias("qp_partkey")).agg(
        F.sum("q").cast("bigint").alias("t")
    )
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").startswith("red ")
    ).select("p_partkey")
    dominant = (
        qty_sup.join(qty_part, F.col("l_partkey") == F.col("qp_partkey"))
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .filter(F.col("q") * 4 > F.col("t"))
        .select("l_suppkey")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(dominant, s.s_suppkey == dominant.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
    )


# --- TPC-H Q21-shaped: suppliers who kept orders waiting — the
#     EXISTS / NOT-EXISTS lineitem self-join pair: the supplier was late
#     on a multi-supplier finished order where no OTHER supplier was
#     late. The fixture has no commit/receipt dates, so "late" =
#     shipped more than 90 days after the order date.
@register(
    "tpch_q21_waiting_orders",
    """
WITH lo AS (
  SELECT l.l_orderkey, l.l_suppkey,
         l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY AS late
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'
)
SELECT s.s_name, COUNT(*) AS numwait
FROM lo l1
JOIN supplier s ON l1.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'AFRICA' AND l1.late
  AND EXISTS (SELECT 1 FROM lo l2 WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lo l3 WHERE l3.l_orderkey = l1.l_orderkey
                  AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
GROUP BY 1
ORDER BY numwait DESC, s_name LIMIT 20""",
)
def tpch_q21_waiting_orders(spark, sf_dir):
    from pmacct_spark.operators.staging import stage

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    lo = stage(  # read three times: l1, the EXISTS, the NOT EXISTS
        li.join(o, li.l_orderkey == o.o_orderkey).select(
            "l_orderkey",
            "l_suppkey",
            (F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 90 DAY")).alias(
                "late"
            ),
        )
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AFRICA")
    l1 = (
        lo.filter("late")
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("l_orderkey", "l_suppkey", "s_name")
    )
    l2 = lo.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    l3 = lo.filter("late").select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    return (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("o2"))
            & (F.col("l_suppkey") != F.col("s2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("o3"))
            & (F.col("l_suppkey") != F.col("s3")),
            "left_anti",
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


# --- encode-as output toggles (tos_encode_as_dscp,
#     fwd_status_encode_as_string, mpls_label_stack_encode_as_array,
#     bgp_comms_encode_as_array + bgp_comms_num,
#     as_path_encode_as_array; reference JSON handler dispatch
#     src/plugin_cmn_json.c:374-392, RFC 7270 table
#     src/plugin_common.c:1204-1244). Arrays are proven by size +
#     element access + join-back (cross-engine array stringification
#     differs, so the hashable columns are scalars).
from pmacct_spark.functions.presentation import (  # noqa: E402
    comms_array_duck,
    comms_array_sql,
    fwd_status_str_duck,
    fwd_status_str_sql,
    mpls_stack_array_duck,
    mpls_stack_array_sql,
    tcp_flags_array_duck,
    tcp_flags_array_sql,
    timestamp_render_duck,
    timestamp_render_sql,
    tos_dscp_duck,
    tos_dscp_sql,
)

_FWD_DERIVE = (
    "CASE event_id % 5 WHEN 0 THEN 64 WHEN 1 THEN 129 "
    "WHEN 2 THEN 192 WHEN 3 THEN 143 ELSE 7 END"
)
_COMMS_DERIVE = (
    "'65000:' || CAST(event_id % 3 AS {S}) || ' 64999:' || "
    "CAST(event_id % 5 AS {S}) || ' 65001:' || CAST(event_id % 7 AS {S})"
)
_PATH_DERIVE = "CAST(as_src AS {S}) || ' ' || CAST(as_dst AS {S})"


@register(
    "presentation_encode_toggles",
    f"""{FLOWS_DUCK_CTE},
shaped AS (
  SELECT {tos_dscp_duck('tos')} AS dscp,
         {fwd_status_str_duck(_FWD_DERIVE)} AS fwd_str,
         {mpls_stack_array_duck('mpls_label_stack')} AS stack,
         {comms_array_duck(_COMMS_DERIVE.format(S='VARCHAR'), num=2)} AS comms,
         {comms_array_duck(_PATH_DERIVE.format(S='VARCHAR'))} AS apath,
         bytes
  FROM flows
)
SELECT dscp, fwd_str,
       CAST(len(stack) AS BIGINT) AS n_labels,
       CAST(stack[1] % 16 AS BIGINT) AS top_label_mod,
       CAST(len(comms) AS BIGINT) AS n_comms,
       MIN(array_to_string(comms, ',')) AS comms_min,
       CAST(len(apath) AS BIGINT) AS n_hops,
       COUNT(*) AS n,
       CAST(SUM(bytes) AS BIGINT) AS bytes
FROM shaped GROUP BY 1, 2, 3, 4, 5, 7""",
)
def presentation_encode_toggles(spark, sf_dir):
    f = flows(spark, sf_dir)
    shaped = f.selectExpr(
        f"{tos_dscp_sql('tos')} AS dscp",
        f"{fwd_status_str_sql(_FWD_DERIVE)} AS fwd_str",
        f"{mpls_stack_array_sql('mpls_label_stack')} AS stack",
        f"{comms_array_sql(_COMMS_DERIVE.format(S='STRING'), num=2)} AS comms",
        f"{comms_array_sql(_PATH_DERIVE.format(S='STRING'))} AS apath",
        "bytes",
    )
    return shaped.selectExpr(
        "dscp", "fwd_str",
        "CAST(size(stack) AS BIGINT) AS n_labels",
        "CAST(element_at(stack, 1) % 16 AS BIGINT) AS top_label_mod",
        "CAST(size(comms) AS BIGINT) AS n_comms",
        "array_join(comms, ',') AS comms_str",
        "CAST(size(apath) AS BIGINT) AS n_hops",
        "bytes",
    ).groupBy(
        "dscp", "fwd_str", "n_labels", "top_label_mod", "n_comms", "n_hops"
    ).agg(
        F.min("comms_str").alias("comms_min"),
        F.count(F.lit(1)).alias("n"),
        F.sum("bytes").cast("bigint").alias("bytes"),
    ).select(
        "dscp", "fwd_str", "n_labels", "top_label_mod", "n_comms",
        "comms_min", "n_hops", "n", "bytes",
    )


# tcp_flags derivation carrying bits >= 64 on some rows: the reference
# bit-decomposes only decimals 1..63 — ECE/CWR-carrying values render
# as the EMPTY array (tcpflags_to_linked_list, plugin_common.c:1178)
_XFLAGS_DERIVE = "tcp_flags + CASE WHEN event_id % 11 = 0 THEN 64 ELSE 0 END"


@register(
    "presentation_tcpflags_timestamps",
    f"""{FLOWS_DUCK_CTE},
shaped AS (
  SELECT COALESCE(array_to_string(
             {tcp_flags_array_duck(f'({_XFLAGS_DERIVE})')}, ','), '')
           AS flags_csv,
         CAST(len({tcp_flags_array_duck(f'({_XFLAGS_DERIVE})')}) AS BIGINT)
           AS n_flags,
         {timestamp_render_duck('ts')} AS ts_plain,
         {timestamp_render_duck('ts', rfc9557=True)} AS ts_rfc,
         bytes
  FROM flows
)
SELECT flags_csv, n_flags,
       MIN(ts_plain) AS ts_plain_min,
       MIN(ts_rfc) AS ts_rfc_min,
       COUNT(*) AS n,
       CAST(SUM(bytes) AS BIGINT) AS bytes
FROM shaped GROUP BY 1, 2""",
)
def presentation_tcpflags_timestamps(spark, sf_dir):
    """tcpflags_encode_as_array + timestamps_utc/timestamps_rfc9557
    (CONFIG-KEYS:1698-1734): set TCP flags as a URG..FIN-ordered string
    array — 0 and >=64 (ECE/CWR) values render EMPTY like the
    reference's 1..63 guard (src/plugin_common.c:1167-1203, tests/100
    golden) — and timestamps rendered plain-UTC vs RFC 9557
    ('T' separator + numeric offset; compose_timestamp
    src/util.c:2550-2583). Arrays serialized to CSV for hashing."""
    f = flows(spark, sf_dir)
    arr = tcp_flags_array_sql(f"({_XFLAGS_DERIVE})")
    shaped = f.selectExpr(
        f"array_join({arr}, ',') AS flags_csv",
        f"CAST(size({arr}) AS BIGINT) AS n_flags",
        f"{timestamp_render_sql('ts')} AS ts_plain",
        f"{timestamp_render_sql('ts', rfc9557=True)} AS ts_rfc",
        "bytes",
    )
    return shaped.groupBy("flags_csv", "n_flags").agg(
        F.min("ts_plain").alias("ts_plain_min"),
        F.min("ts_rfc").alias("ts_rfc_min"),
        F.count(F.lit(1)).alias("n"),
        F.sum("bytes").cast("bigint").alias("bytes"),
    )
