"""TPC-H-style headline queries over the fixture star schema — the classic
multi-join analytical shapes (Q3 shipping priority, Q5 local supplier
volume, Q10 returned-item reporting), adapted to the fixture's columns.

These are the benchmark workhorses: multi-table join chains where Catalyst's
join ordering, broadcast selection, and AQE do the heavy lifting. Join tree
shape at scale: facts (orders/lineitem) shuffle on their keys once; all
dimension arms broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import dsum
from ..io import load_table
from ..registry import query

_REV = "l_extendedprice * (1.0 - l_discount)"
_OSUM_REV = f"CAST(SUM(CAST({_REV} AS DECIMAL(27,6))) AS DOUBLE) AS revenue"


# --------------------------------------------------------------------------
# Q3-style: top-10 unshipped orders by revenue for one market segment.
@query(
    "tpch_q3_shipping_priority",
    oracle=f"""
        SELECT l_orderkey, revenue, o_orderdate, o_orderpriority FROM (
            SELECT l_orderkey, {_OSUM_REV},
                   o_orderdate, o_orderpriority
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
              AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
            GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ) g
        ORDER BY revenue DESC, l_orderkey ASC
        LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1995-03-15 00:00:00").cast("timestamp_ntz")
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(revenue, "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


# --------------------------------------------------------------------------
# Q5-style: revenue per nation where customer and supplier share the nation
# (the classic 6-table join, minus the date dimension).
@query(
    "tpch_q5_local_supplier_volume",
    oracle=f"""
        SELECT n_name, {_OSUM_REV}
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name
    """,
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(revenue, "revenue"))
    )


# --------------------------------------------------------------------------
# Q10-style: top-20 customers by revenue on returned items in a quarter.
@query(
    "tpch_q10_returned_items",
    oracle=f"""
        SELECT c_custkey, c_name, revenue, n_name, c_acctbal FROM (
            SELECT c_custkey, c_name, {_OSUM_REV}, n_name, c_acctbal
            FROM customer
            JOIN orders   ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            JOIN nation   ON c_nationkey = n_nationkey
            WHERE o_orderdate >= TIMESTAMP '1995-10-01 00:00:00'
              AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
              AND l_returnflag = 'R'
            GROUP BY c_custkey, c_name, n_name, c_acctbal
        ) g
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-10-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(dsum(revenue, "revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name", "c_acctbal")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


# --------------------------------------------------------------------------
# Approximate aggregation (HLL distinct + approximate quantiles): the
# one-pass sketch path for 100 TB interactive profiling. DuckDB's sketches
# differ, so this is a rows-only entry (no oracle) — the EXACT twins are
# oracle-checked in rel_agg_distinct / rel_agg_percentile.
@query("rel_approx_aggs")
def rel_approx_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("approx_p50"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )


# --------------------------------------------------------------------------
# Q4-style: order-priority checking — EXISTS(lineitem shipped late).
@query(
    "tpch_q4_order_priority",
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1995-07-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1995-10-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate)
        GROUP BY o_orderpriority
    """,
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-07-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1995-10-01 00:00:00").cast("timestamp_ntz"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    late = l.join(o, l.l_orderkey == o.o_orderkey).filter(
        F.col("l_shipdate") > F.col("o_orderdate")
    ).select("l_orderkey").distinct()
    return (
        o.join(late, o.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# --------------------------------------------------------------------------
# Q12-style: shipmode-ish split via conditional aggregation over priorities.
@query(
    "tpch_q12_priority_split",
    oracle="""
        SELECT l_linestatus,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_linestatus
    """,
)
def tpch_q12_priority_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias(
                "high_line_count"
            ),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias(
                "low_line_count"
            ),
        )
    )


# --------------------------------------------------------------------------
# Q14-style: promo revenue share — conditional ratio of two decimal-exact
# sums (division of exactly-matching doubles -> exact cross-engine).
@query(
    "tpch_q14_promo_share",
    oracle=f"""
        SELECT CAST(SUM(CAST(CASE WHEN p_type LIKE 'PROMO%'
                         THEN {_REV} ELSE 0.0 END AS DECIMAL(27,6))) AS DOUBLE)
               / CAST(SUM(CAST({_REV} AS DECIMAL(27,6))) AS DOUBLE)
               AS promo_share,
               COUNT(*) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-07-01 00:00:00'
    """,
)
def tpch_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-07-01 00:00:00").cast("timestamp_ntz"))
    )
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    promo_rev = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(0.0)
    return l.join(F.broadcast(p), l.l_partkey == p.p_partkey).agg(
        (
            F.sum(promo_rev.cast("decimal(27,6)")).cast("double")
            / F.sum(rev.cast("decimal(27,6)")).cast("double")
        ).alias("promo_share"),
        F.count("*").alias("n_lines"),
    )


# --------------------------------------------------------------------------
# Q17-style: small-quantity-order revenue — correlated average subquery
# (per-part avg quantity), decorrelated by Catalyst into an aggregate+join.
@query(
    "tpch_q17_small_quantity",
    oracle="""
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE)
                   / 7.0 AS avg_yearly,
               COUNT(*) AS n_lines
        FROM lineitem l
        WHERE l.l_quantity < (
            SELECT 0.5 * (CAST(SUM(CAST(i.l_quantity AS DECIMAL(27,6))) AS DOUBLE)
                          / COUNT(*))
            FROM lineitem i WHERE i.l_partkey = l.l_partkey
        )
    """,
)
def tpch_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    per_part = l.groupBy(F.col("l_partkey").alias("pk")).agg(
        (
            F.lit(0.5)
            * (
                F.sum(F.col("l_quantity").cast("decimal(27,6)")).cast("double")
                / F.count("*")
            )
        ).alias("half_avg_qty")
    )
    return (
        l.join(F.broadcast(per_part), l.l_partkey == per_part.pk)
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(27,6)")).cast("double")
                / 7.0
            ).alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# Q18-style: large-volume customers — HAVING over a grouped subquery feeding
# a semi join, then top-k.
@query(
    "tpch_q18_large_volume",
    oracle="""
        SELECT c_custkey, o_orderkey, o_totalprice, total_qty FROM (
            SELECT o.o_custkey AS c_custkey, o.o_orderkey, o.o_totalprice,
                   CAST(SUM(CAST(l.l_quantity AS DECIMAL(27,6))) AS DOUBLE)
                       AS total_qty
            FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_custkey, o.o_orderkey, o.o_totalprice
            HAVING SUM(l.l_quantity) > 150
        ) g
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 20
    """,
)
def tpch_q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("c_custkey"), "o_orderkey", "o_totalprice"
        )
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(27,6)"))
            .cast("double")
            .alias("total_qty"),
            F.sum("l_quantity").alias("__raw_qty"),
        )
        .filter(F.col("__raw_qty") > 150)
        .drop("__raw_qty")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(20)
    )
