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
