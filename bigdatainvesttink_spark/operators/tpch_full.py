"""Remaining TPC-H-style query shapes, adapted to the fixture star schema.

The driver fixtures omit ``partsupp`` and several TPC-H columns
(``l_shipmode``, ``l_commitdate``, ``l_receiptdate``, ``c_phone``,
``p_container``), so each query keeps the *operator shape* of its TPC-H
namesake — the join topology, subquery class, and aggregation pattern —
with predicates rewritten onto columns that exist (FIXTURES.md §A).

Scale notes (100 TB): every dimension arm (region/nation/customer-agg/
part/supplier) broadcasts; the only shuffles are the fact-fact
lineitem⋈orders sort-merge joins and the final group-bys, which AQE
coalesces. Q21/Q22's EXISTS/NOT-EXISTS land as left-semi/left-anti joins
keyed on the same l_orderkey partitioning as the main join, so Catalyst
reuses the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import dsum
from ..io import load_table
from ..registry import query

_REV = "l_extendedprice * (1.0 - l_discount)"
_DEC = "decimal(27,6)"


def _rev() -> F.Column:
    return F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))


def _ts(s: str) -> F.Column:
    return F.lit(s + " 00:00:00").cast("timestamp_ntz")


# --------------------------------------------------------------------------
# Q6-style: forecasting revenue change — pure scan+filter+agg, the query
# whose whole cost is parquet pushdown (no join, no shuffle beyond 1 agg).
@query(
    "tpch_q6_forecast_revenue",
    oracle="""
        SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(27,6)))
                    AS DOUBLE) AS revenue,
               COUNT(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= _ts("1995-01-01"))
            & (F.col("l_shipdate") < _ts("1996-01-01"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
            F.count("*").alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# Q7-style: volume shipping between two nations — the cross-nation-pair
# join (supplier nation × customer nation) with per-year revenue.
@query(
    "tpch_q7_volume_shipping",
    oracle=f"""
        SELECT supp_nation, cust_nation, l_year,
               CAST(SUM(CAST({_REV} AS DECIMAL(27,6))) AS DOUBLE) AS revenue
        FROM (
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(year(l_shipdate) AS INT) AS l_year,
                   l_extendedprice, l_discount
            FROM supplier s
            JOIN lineitem l ON s_suppkey = l_suppkey
            JOIN orders o ON o_orderkey = l_orderkey
            JOIN customer c ON c_custkey = o_custkey
            JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
            WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
              AND l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                                 AND TIMESTAMP '1996-12-31 23:59:59'
        ) shipping
        GROUP BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            _ts("1995-01-01"), F.lit("1996-12-31 23:59:59").cast("timestamp_ntz")
        )
    )
    pair = (F.col("supp_nation") == "NATION_1") & (
        F.col("cust_nation") == "NATION_2"
    ) | (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(dsum(_rev(), "revenue"))
    )


# --------------------------------------------------------------------------
# Q8-style: national market share — ratio of conditional sum to total sum
# per year over a 6-table join (region-gated customers).
@query(
    "tpch_q8_market_share",
    oracle=f"""
        SELECT o_year,
               CAST(SUM(CAST(CASE WHEN supp_nation = 'NATION_3'
                              THEN {_REV} ELSE 0.0 END AS DECIMAL(27,6)))
                    AS DOUBLE)
               / CAST(SUM(CAST({_REV} AS DECIMAL(27,6))) AS DOUBLE)
               AS mkt_share
        FROM (
            SELECT CAST(year(o_orderdate) AS INT) AS o_year,
                   l_extendedprice, l_discount, n1.n_name AS supp_nation
            FROM part p
            JOIN lineitem l ON p_partkey = l_partkey
            JOIN supplier s ON s_suppkey = l_suppkey
            JOIN orders o ON o_orderkey = l_orderkey
            JOIN customer c ON c_custkey = o_custkey
            JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
            JOIN region r ON n2.n_regionkey = r_regionkey
            WHERE r_name = 'AMERICA'
              AND o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                                  AND TIMESTAMP '1996-12-31 23:59:59'
              AND p_type LIKE '%STANDARD%'
        ) all_nations
        GROUP BY o_year
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_type").like("%STANDARD%")
    ).select("p_partkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    # customers restricted to the AMERICA region via nation->region
    c_region = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .join(
            F.broadcast(
                n.join(
                    F.broadcast(r), n.n_regionkey == r.r_regionkey
                ).select("n_nationkey")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    n1 = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(
            _ts("1995-01-01"), F.lit("1996-12-31 23:59:59").cast("timestamp_ntz")
        )
    )
    l = load_table(spark, sf_dir, "lineitem")
    rev = _rev()
    brazil_rev = F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(0.0)
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c_region), o.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            (
                F.sum(brazil_rev.cast(_DEC)).cast("double")
                / F.sum(rev.cast(_DEC)).cast("double")
            ).alias("mkt_share")
        )
    )


# --------------------------------------------------------------------------
# Q9-style: product-type profit — profit = revenue − cost, with
# ps_supplycost (no partsupp fixture) proxied by p_retailprice.
@query(
    "tpch_q9_product_profit",
    oracle="""
        SELECT nation, CAST(year(o_orderdate) AS INT) AS o_year,
               CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                             - p_retailprice * l_quantity
                             AS DECIMAL(27,6))) AS DOUBLE) AS sum_profit
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN (SELECT n_nationkey, n_name AS nation FROM nation) n
             ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
        GROUP BY nation, year(o_orderdate)
    """,
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")
    ).select("p_partkey", "p_retailprice")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    l = load_table(spark, sf_dir, "lineitem")
    profit = _rev() - F.col("p_retailprice") * F.col("l_quantity")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("nation", F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(dsum(profit, "sum_profit"))
    )


# --------------------------------------------------------------------------
# Q13-style: customer order-count distribution — LEFT OUTER join then a
# histogram over the per-customer counts (two cascaded aggregations).
@query(
    "tpch_q13_order_distribution",
    oracle="""
        SELECT c_count, COUNT(*) AS custdist
        FROM (
            SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
            FROM customer c
            LEFT OUTER JOIN orders o
              ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
            GROUP BY c.c_custkey
        ) c_orders
        GROUP BY c_count
    """,
)
def tpch_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


# --------------------------------------------------------------------------
# Q15-style: top supplier — revenue-per-supplier CTE joined against its own
# MAX (scalar subquery), the classic "argmax via self-aggregation" shape.
@query(
    "tpch_q15_top_supplier",
    oracle=f"""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   CAST(SUM(CAST({_REV} AS DECIMAL(27,6))) AS DOUBLE)
                       AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1996-04-01"))
    )
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(_rev(), "total_revenue")
    )
    # max-revenue filter without a driver round-trip or a single-partition
    # window: broadcast the 1-row MAX and filter against it (stays parallel
    # even when the per-supplier aggregate is millions of rows).
    mx = revenue.agg(F.max("total_revenue").alias("__mx"))
    top = (
        revenue.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("__mx"))
        .drop("__mx")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return s.join(
        F.broadcast(top), s.s_suppkey == top.supplier_no
    ).select("s_suppkey", "s_name", "total_revenue")


# --------------------------------------------------------------------------
# Q16-style: supplier diversity per part descriptor — COUNT(DISTINCT
# supplier) per (brand, type, size) with NOT-IN brand exclusion; the
# partsupp pairing is proxied by observed lineitem (part, supplier) pairs.
@query(
    "tpch_q16_supplier_diversity",
    oracle="""
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM part JOIN lineitem ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#1'
          AND p_type NOT LIKE 'SMALL%'
          AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
        GROUP BY p_brand, p_type, p_size
    """,
)
def tpch_q16_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & ~F.col("p_type").like("SMALL%")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    l = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# Q19-style: discounted revenue — three disjunctive brand/size/quantity
# branches ORed together; exercises OR-predicate pushdown + CNF handling.
@query(
    "tpch_q19_discounted_revenue",
    oracle=f"""
        SELECT CAST(SUM(CAST({_REV} AS DECIMAL(27,6))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_lines
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity >= 1 AND l_quantity <= 11)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
               AND l_quantity >= 10 AND l_quantity <= 20)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
               AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def tpch_q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    l = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    branch = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & (q >= 1)
        & (q <= 11)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 25)
        & (q >= 10)
        & (q <= 20)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 35)
        & (q >= 20)
        & (q <= 30)
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(branch)
        .agg(dsum(_rev(), "revenue"), F.count("*").alias("n_lines"))
    )


# --------------------------------------------------------------------------
# Q21-style: suppliers who kept orders waiting — the EXISTS + NOT EXISTS
# pair over lineitem self-joins ("another supplier contributed; no OTHER
# supplier was late"), lateness proxied by l_shipdate > o_orderdate + 60d.
@query(
    "tpch_q21_waiting_suppliers",
    oracle="""
        SELECT s_name, COUNT(*) AS numwait FROM (
            SELECT DISTINCT s.s_name, l1.l_orderkey, l1.l_suppkey
            FROM supplier s
            JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
            JOIN orders o ON o.o_orderkey = l1.l_orderkey
            WHERE o.o_orderstatus = 'F'
              AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
              AND EXISTS (SELECT 1 FROM lineitem l2
                          WHERE l2.l_orderkey = l1.l_orderkey
                            AND l2.l_suppkey <> l1.l_suppkey)
              AND NOT EXISTS (
                  SELECT 1 FROM lineitem l3 JOIN orders o3
                      ON o3.o_orderkey = l3.l_orderkey
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
        ) waiting
        GROUP BY s_name
    """,
)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderstatus"
    )
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    lo = l.join(o, l.l_orderkey == o.o_orderkey).withColumn("is_late", late)
    # per-order supplier stats in ONE pass (instead of two self-joins):
    # EXISTS(other supplier)      <=> n_suppliers > 1
    # NOT EXISTS(other late supp) <=> the only late supplier is this one
    per_order = lo.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias(
            "n_late_suppliers"
        ),
    )
    waiting = (
        lo.filter((F.col("o_orderstatus") == "F") & F.col("is_late"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .join(per_order, F.col("l_orderkey") == F.col("ok"))
        .filter((F.col("n_suppliers") > 1) & (F.col("n_late_suppliers") == 1))
    )
    return (
        waiting.join(F.broadcast(s), waiting.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


# --------------------------------------------------------------------------
# Q22-style: global sales opportunity — scalar AVG subquery + anti join
# (customers above the positive-balance average with no *recent* orders),
# country code proxied by c_nationkey (fixtures have no c_phone; every
# fixture customer has at least one lifetime order, so "dormant" is
# defined as no order on/after 2001-01-01 to keep the anti join selective).
@query(
    "tpch_q22_sales_opportunity",
    oracle="""
        SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(27,6))) AS DOUBLE)
                   AS totacctbal
        FROM customer c
        WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
          AND c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                           WHERE c_acctbal > 0.0
                             AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13))
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
        GROUP BY c_nationkey
    """,
)
def tpch_q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    codes = [1, 3, 5, 7, 9, 11, 13]
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(codes)
    )
    # scalar subquery: cross-join the 1-row average (broadcast NL join).
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("__avg_bal")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= _ts("2001-01-01"))
        .select("o_custkey")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            dsum("c_acctbal", "totacctbal"),
        )
    )


# --------------------------------------------------------------------------
# partsupp proxy (the fixtures ship no partsupp table): the observed
# (l_partkey, l_suppkey) pairs, with availqty = total shipped quantity and
# a key-derived deterministic supply cost. Gives Q2/Q11/Q20 their real join
# topology and subquery classes on data both engines can rebuild exactly.
_PS_SQL = """
    ps AS (
        SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE)
                   AS ps_availqty,
               CAST((l_partkey * 31 + l_suppkey * 17) % 1000 + 1 AS DOUBLE)
                   AS ps_supplycost
        FROM lineitem GROUP BY l_partkey, l_suppkey
    )
"""


def _partsupp_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    return (
        l.groupBy(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .agg(dsum("l_quantity", "ps_availqty"))
        .withColumn(
            "ps_supplycost",
            (
                (F.col("ps_partkey") * 31 + F.col("ps_suppkey") * 17) % 1000 + 1
            ).cast("double"),
        )
    )


# --------------------------------------------------------------------------
# Q2-style: minimum-cost supplier — correlated MIN subquery per part over
# region-gated suppliers, the classic argmin-within-group shape (window min
# + equality filter on Spark; no second pass over ps).
@query(
    "tpch_q2_min_cost_supplier",
    oracle=f"""
        WITH {_PS_SQL}
        SELECT p_partkey, p_brand, s_name, n_name, s_acctbal, ps_supplycost
        FROM ps
        JOIN supplier ON s_suppkey = ps_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        JOIN part ON p_partkey = ps_partkey
        WHERE r_name = 'EUROPE' AND p_size = 15
          AND ps_supplycost = (
              SELECT MIN(ps2.ps_supplycost)
              FROM ps ps2
              JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
              JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
              JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
              WHERE r2.r_name = 'EUROPE' AND ps2.ps_partkey = ps.ps_partkey)
    """,
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ps = _partsupp_proxy(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey", "n_name"
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    europe_supp = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    europe_ps = ps.join(
        F.broadcast(europe_supp), ps.ps_suppkey == F.col("s_suppkey")
    )
    w = Window.partitionBy("ps_partkey")
    best = europe_ps.withColumn(
        "__mn", F.min("ps_supplycost").over(w)
    ).filter(F.col("ps_supplycost") == F.col("__mn"))
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 15).select(
        "p_partkey", "p_brand"
    )
    return best.join(F.broadcast(p), best.ps_partkey == p.p_partkey).select(
        "p_partkey", "p_brand", "s_name", "n_name", "s_acctbal", "ps_supplycost"
    )


# --------------------------------------------------------------------------
# Q11-style: important stock — per-part inventory value within one nation,
# kept when above a fixed fraction of the nation's total (scalar-subquery
# threshold; fraction 0.0015 tuned so the fixture yields a real result set).
@query(
    "tpch_q11_important_stock",
    oracle=f"""
        WITH {_PS_SQL},
        filtered AS (
            SELECT ps_partkey,
                   CAST(ps_supplycost * ps_availqty AS DECIMAL(27,6)) AS v
            FROM ps
            JOIN supplier ON s_suppkey = ps_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_7'
        )
        SELECT ps_partkey, CAST(SUM(v) AS DOUBLE) AS value
        FROM filtered
        GROUP BY ps_partkey
        HAVING CAST(SUM(v) AS DOUBLE) >
               (SELECT CAST(SUM(v) AS DOUBLE) * 0.0015 FROM filtered)
    """,
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = _partsupp_proxy(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_7"
    ).select("n_nationkey")
    nation_supp = s.join(
        F.broadcast(n), s.s_nationkey == n.n_nationkey
    ).select("s_suppkey")
    v = (F.col("ps_supplycost") * F.col("ps_availqty")).cast(_DEC)
    filtered = ps.join(
        F.broadcast(nation_supp), ps.ps_suppkey == F.col("s_suppkey")
    ).select("ps_partkey", v.alias("v"))
    per_part = filtered.groupBy("ps_partkey").agg(
        F.sum("v").cast("double").alias("value")
    )
    thresh = filtered.agg(
        (F.sum("v").cast("double") * 0.0015).alias("__thr")
    )
    return (
        per_part.join(F.broadcast(thresh))
        .filter(F.col("value") > F.col("__thr"))
        .drop("__thr")
    )


# --------------------------------------------------------------------------
# Q20-style: excess-stock suppliers — the nested-IN + correlated-sum class:
# suppliers in one nation holding more than half their 1995 shipments of
# 'red' parts. The correlated SUM becomes an aggregated join (identical
# NULL-free semantics spelled out in both engines).
@query(
    "tpch_q20_excess_stock",
    oracle=f"""
        WITH {_PS_SQL},
        yearly AS (
            SELECT l_partkey, l_suppkey,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE)
                       AS qty
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
            GROUP BY l_partkey, l_suppkey
        )
        SELECT DISTINCT s_suppkey, s_name
        FROM supplier
        JOIN ps ON ps_suppkey = s_suppkey
        JOIN yearly y ON y.l_partkey = ps_partkey AND y.l_suppkey = ps_suppkey
        JOIN part ON p_partkey = ps_partkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_5' AND p_name LIKE 'red%'
          AND ps_availqty > 0.5 * qty
    """,
)
def tpch_q20_excess_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = _partsupp_proxy(spark, sf_dir)
    yearly = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= _ts("1995-01-01"))
            & (F.col("l_shipdate") < _ts("1996-01-01"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(dsum("l_quantity", "qty"))
    )
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("red%")
    ).select("p_partkey")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_5"
    ).select("n_nationkey")
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name")
    return (
        ps.join(
            yearly,
            (ps.ps_partkey == yearly.l_partkey)
            & (ps.ps_suppkey == yearly.l_suppkey),
        )
        .filter(F.col("ps_availqty") > 0.5 * F.col("qty"))
        .join(F.broadcast(p), F.col("ps_partkey") == p.p_partkey)
        .join(F.broadcast(s), F.col("ps_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name")
        .distinct()
    )


# --------------------------------------------------------------------------
# TPC-H refresh streams (RF1/RF2) — the part of the benchmark beyond the
# 22 read queries: RF1 inserts new lineitems (modeled: a deterministic
# 1-in-13 orderkey slice re-keyed +3,000,000), RF2 deletes old orders
# (orderkey % 7 = 3). The refreshed table is (lineitem UNION inserts)
# ANTI JOIN deletes, and Q1 over it must equal the oracle's recompute —
# proof the engine's insert/delete/re-aggregate cycle (union + anti-join
# + the same decimal-routed Q1 aggregate) lands the benchmark's refresh
# semantics exactly. At scale RF1/RF2 are the CDC path (d1_cdc_apply);
# here the declarative set algebra IS the refresh.
@query(
    "tpch_rf_refresh_q1",
    oracle="""
        WITH inserts AS (
            SELECT * REPLACE (l_orderkey + 3000000 AS l_orderkey)
            FROM lineitem WHERE l_orderkey % 13 = 5
        ),
        refreshed AS (
            SELECT * FROM (
                SELECT * FROM lineitem UNION ALL SELECT * FROM inserts
            ) u
            WHERE u.l_orderkey % 7 <> 3
        )
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE)
                   AS sum_qty,
               CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                        AS DECIMAL(27,6))) AS DOUBLE) AS sum_disc_price,
               COUNT(*) AS count_order
        FROM refreshed
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_rf_refresh_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    inserts = l.filter(F.col("l_orderkey") % 13 == 5).withColumn(
        "l_orderkey", F.col("l_orderkey") + 3000000
    )
    refreshed = l.unionByName(inserts).filter(
        F.col("l_orderkey") % 7 != 3
    )
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        refreshed.filter(
            F.col("l_shipdate")
            <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz")
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(27,6)"))
            .cast("double")
            .alias("sum_qty"),
            F.sum(disc_price.cast("decimal(27,6)"))
            .cast("double")
            .alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
    )
