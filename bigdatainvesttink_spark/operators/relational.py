"""Relational core over the TPC-H-ish fixtures (SURVEY.md §2-D7).

The reference delegates all query work to ClickHouse (SURVEY §0); here the
full relational surface is first-class: scans with pushdown, projections,
filters, hash aggregation (plain / distinct / rollup / cube / grouping
sets), joins (broadcast, sort-merge, semi, anti), window functions (ranking,
analytic, running frames), set operations, sort/limit/top-k, and the scalar
function library.

Scale notes per query are inline; the common themes:
  * dimensions are broadcast (region/nation/supplier/part at TPC-H ratios
    stay small at any SF — broadcast keeps fact tables shuffle-free);
  * aggregations rely on partial (map-side) aggregation, which Spark plans
    automatically for algebraic aggregates;
  * exact float parity with the DuckDB oracle via decimal-routed sums
    (functions.core docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import davg, dsum, top_k_per_group
from ..io import load_table
from ..registry import query

# Oracle spelling of the decimal-exact SUM/AVG (functions/core.py).
def _osum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(27,6))) AS DOUBLE) AS {alias}"


def _oavg(expr: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(27,6))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )


# --------------------------------------------------------------------------
# Flagship: TPC-H Q1-style pricing summary.
# Plan shape: parquet scan (shipdate filter + column pruning pushed down)
# -> partial hash agg (map-side) -> single shuffle on 2 low-cardinality keys
# -> final hash agg -> sort. At 100 TB this is scan-bound and embarrassingly
# parallel; the shuffle moves only |groups| * |partitions| pre-aggregated
# rows.
@query(
    "q1_pricing_summary",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               {_osum('l_quantity', 'sum_qty')},
               {_osum('l_extendedprice', 'sum_base_price')},
               {_osum('l_extendedprice * (1.0 - l_discount)', 'sum_disc_price')},
               {_osum('l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)', 'sum_charge')},
               {_oavg('l_quantity', 'avg_qty')},
               {_oavg('l_extendedprice', 'avg_price')},
               {_oavg('l_discount', 'avg_disc')},
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# Projection + filter + scalar function library (string/date/math/case).
# Entirely map-side: no shuffle; filter and the 4-column ReadSchema push to
# the parquet scan.
@query(
    "rel_filter_project_scalar",
    oracle="""
        SELECT o_orderkey,
               upper(substring(o_orderpriority, 1, 1)) AS prio_code,
               CAST(year(o_orderdate) AS INT) AS order_year,
               o_totalprice / 10.0 AS commission,
               CASE WHEN o_totalprice >= 100000.0 THEN 'big' ELSE 'small' END AS size_class,
               length(o_orderstatus) AS status_len
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderstatus <> 'F'
          AND o_totalprice > 1000.0
    """,
)
def rel_filter_project_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("o_orderstatus") != "F")
            & (F.col("o_totalprice") > 1000.0)
        )
        .select(
            "o_orderkey",
            F.upper(F.substring("o_orderpriority", 1, 1)).alias("prio_code"),
            F.year("o_orderdate").cast("int").alias("order_year"),
            (F.col("o_totalprice") / 10.0).alias("commission"),
            F.when(F.col("o_totalprice") >= 100000.0, "big")
            .otherwise("small")
            .alias("size_class"),
            F.length("o_orderstatus").alias("status_len"),
        )
    )


# --------------------------------------------------------------------------
# Broadcast dimension join chain: customer ⋈ nation ⋈ region + group agg.
# nation/region are tiny at every SF -> broadcast hash joins, zero shuffle
# for the join; the only shuffle is the final groupBy on region name.
@query(
    "rel_join_broadcast_dims",
    oracle=f"""
        SELECT r.r_name AS region_name,
               COUNT(*) AS n_customers,
               {_osum('c.c_acctbal', 'total_acctbal')}
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
    """,
)
def rel_join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.count("*").alias("n_customers"),
            dsum("c_acctbal", "total_acctbal"),
        )
    )


# --------------------------------------------------------------------------
# Fact-fact join (orders ⋈ lineitem) + aggregation: the sort-merge/shuffle
# path. Both sides shuffle on orderkey; AQE converts to broadcast if one
# side's post-filter size allows. Q3-flavored.
@query(
    "rel_join_fact_fact",
    oracle=f"""
        SELECT o.o_orderpriority AS priority,
               COUNT(DISTINCT o.o_orderkey) AS n_orders,
               {_osum('l.l_extendedprice * (1.0 - l.l_discount)', 'revenue')}
        FROM orders o
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        GROUP BY o.o_orderpriority
    """,
)
def rel_join_fact_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp_ntz")
    )
    l = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.countDistinct("o_orderkey").alias("n_orders"),
            dsum(revenue, "revenue"),
        )
    )


# --------------------------------------------------------------------------
# Semi join (EXISTS): customers having at least one urgent order.
# left_semi keeps only left columns and short-circuits per key — at scale it
# shuffles both sides on the key but materializes nothing from the right.
@query(
    "rel_join_semi",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer
        WHERE EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
        )
    """,
)
def rel_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


# --------------------------------------------------------------------------
# Anti join (NOT EXISTS): customers who never placed an urgent order.
# (At fixture SFs every customer has SOME order, so the subquery filters on
# priority to keep the anti side non-trivially populated.)
@query(
    "rel_join_anti",
    oracle="""
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderpriority = '1-URGENT')
    """,
)
def rel_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


# --------------------------------------------------------------------------
# Distinct + approximate aggregation. countDistinct plans as a two-phase
# expand+agg (exact); at 100 TB prefer approx_count_distinct (HLL, one pass,
# no expand) — both shown, the approx one not oracle-compared (HLL seeds
# differ across engines) so the distinct query carries the oracle.
@query(
    "rel_agg_distinct",
    oracle="""
        SELECT o_orderstatus AS status,
               COUNT(DISTINCT o_custkey) AS n_customers,
               COUNT(DISTINCT o_orderpriority) AS n_priorities,
               COUNT(*) AS n_orders
        FROM orders
        GROUP BY o_orderstatus
    """,
)
def rel_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
        F.count("*").alias("n_orders"),
    )


# --------------------------------------------------------------------------
# ROLLUP: hierarchical subtotals (region -> nation -> total) — the
# "sector-level rollup" shape of SURVEY §2 B9 on TPC-H keys.
@query(
    "rel_rollup",
    oracle=f"""
        SELECT r.r_name AS region_name, n.n_name AS nation_name,
               COUNT(*) AS n_suppliers,
               {_osum('s.s_acctbal', 'total_bal')}
        FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def rel_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return (
        joined.select(
            F.col("r_name").alias("region_name"),
            F.col("n_name").alias("nation_name"),
            "s_acctbal",
        )
        .rollup("region_name", "nation_name")
        .agg(F.count("*").alias("n_suppliers"), dsum("s_acctbal", "total_bal"))
    )


# --------------------------------------------------------------------------
# CUBE: all grouping combinations of (returnflag, linestatus).
@query(
    "rel_cube",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n_items,
               {_osum('l_quantity', 'sum_qty')}
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def rel_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_items"), dsum("l_quantity", "sum_qty")
    )


# --------------------------------------------------------------------------
# GROUPING SETS with grouping_id — distinguishes the NULL-from-subtotal rows
# from genuine NULL keys (needed for warehouse-grade rollup dashboards).
@query(
    "rel_grouping_sets",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
               COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def rel_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping(o_orderstatus) AS INT) AS g_status,
               CAST(grouping(o_orderpriority) AS INT) AS g_prio,
               COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


# --------------------------------------------------------------------------
# Window / ranking: top-3 highest-balance customers per nation (B8 shape).
# One shuffle on the partition key; deterministic tiebreak on custkey.
@query(
    "rel_window_topk_per_group",
    oracle="""
        SELECT c_nationkey, c_custkey, c_acctbal, rnk
        FROM (
            SELECT c_nationkey, c_custkey, c_acctbal,
                   ROW_NUMBER() OVER (
                       PARTITION BY c_nationkey
                       ORDER BY c_acctbal DESC, c_custkey ASC) AS rnk
            FROM customer
        ) ranked
        WHERE rnk <= 3
    """,
)
def rel_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return top_k_per_group(
        c.select("c_nationkey", "c_custkey", "c_acctbal"),
        ["c_nationkey"],
        [F.col("c_acctbal").desc(), F.col("c_custkey").asc()],
        3,
        rank_col="rnk",
    )


# --------------------------------------------------------------------------
# Window / running frame: cumulative revenue per customer over order dates
# (rowsBetween unboundedPreceding..current). Decimal-routed cumsum so every
# prefix matches the oracle exactly.
@query(
    "rel_window_running_sum",
    oracle="""
        SELECT o_custkey, o_orderkey, o_orderdate,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate ASC, o_orderkey ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS running_spend
        FROM orders
    """,
)
def rel_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(27,6)"))
        .over(w)
        .cast("double")
        .alias("running_spend"),
    )


# --------------------------------------------------------------------------
# Window / analytic: lag & lead over each customer's order history —
# days-since-previous-order. LAG/LEAD are the building blocks of the
# B2/B4 return-series analytics.
@query(
    "rel_window_lag_lead",
    oracle="""
        SELECT o_custkey, o_orderkey,
               CAST(date_diff('day',
                    CAST(LAG(o_orderdate) OVER w AS DATE),
                    CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_prev,
               LEAD(o_orderkey) OVER w AS next_orderkey
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
    """,
)
def rel_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag(F.col("o_orderdate").cast("date")).over(w),
        )
        .cast("bigint")
        .alias("days_since_prev"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
    )


# --------------------------------------------------------------------------
# Set operations: UNION / INTERSECT / EXCEPT over key sets, tagged so a
# single result covers all three. Each set op is a shuffle on the full row.
@query(
    "rel_set_ops",
    oracle="""
        SELECT 'union' AS op, k FROM (
            SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
            UNION
            SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
        ) u
        UNION ALL
        SELECT 'intersect' AS op, k FROM (
            SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
            INTERSECT
            SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
        ) i
        UNION ALL
        SELECT 'except' AS op, k FROM (
            SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
            EXCEPT
            SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
        ) e
    """,
)
def rel_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    open_k = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("k")
    )
    done_k = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("k")
    )
    tag = lambda df, name: df.select(F.lit(name).alias("op"), "k")  # noqa: E731
    return (
        tag(open_k.union(done_k).distinct(), "union")
        .unionByName(tag(open_k.intersect(done_k), "intersect"))
        .unionByName(tag(open_k.distinct().exceptAll(done_k.distinct()), "except"))
    )


# --------------------------------------------------------------------------
# Global sort + limit (top-k): k largest orders. Spark plans TakeOrderedAndProject
# — per-partition heap + driver merge, no full sort at scale.
@query(
    "rel_sort_limit",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 25
    """,
)
def rel_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
    )


# --------------------------------------------------------------------------
# Exact percentiles + min/max spread per group (B3's quantile building
# block). Spark `percentile` and DuckDB `quantile_cont` both do linear
# interpolation over the sorted values; rounded to 6dp for cross-engine
# float stability.
@query(
    "rel_agg_percentile",
    oracle="""
        SELECT l_returnflag,
               round(quantile_cont(l_extendedprice, 0.5), 6) AS p50_price,
               round(quantile_cont(l_extendedprice, 0.99), 6) AS p99_price,
               min(l_extendedprice) AS min_price,
               max(l_extendedprice) AS max_price
        FROM lineitem
        GROUP BY l_returnflag
    """,
)
def rel_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", 0.5), 6).alias("p50_price"),
        F.round(F.percentile("l_extendedprice", 0.99), 6).alias("p99_price"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )


# --------------------------------------------------------------------------
# Array/higher-order function suite (SURVEY §2-E scalar-function families):
# size / distinct / sort / slice / contains / element_at / max / concat_ws,
# all JVM-side over the per-document token array. Entirely map-side — no
# shuffle, no UDF; at 100 TB this is a pure scan-projection that pipelines
# inside one WholeStageCodegen span.
@query(
    "rel_array_suite",
    oracle="""
        WITH t AS (
            SELECT doc_id, lang,
                   list_filter(string_split(text, ' '), x -> x <> '') AS toks
            FROM documents
        )
        SELECT doc_id, lang,
               len(toks) AS n_toks,
               len(list_distinct(toks)) AS n_uniq,
               array_to_string(list_slice(list_sort(list_distinct(toks)), 1, 3),
                               '|') AS first3_uniq,
               list_contains(toks, 'the') AS has_the,
               list_reverse(toks)[1] AS last_tok,
               list_max(toks) AS max_tok,
               array_to_string(list_slice(toks, 1, 2), '|') AS head_join
        FROM t
    """,
)
def rel_array_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokenize

    d = load_table(spark, sf_dir, "documents")
    toks = tokenize("text")
    return d.select(
        "doc_id",
        "lang",
        F.size(toks).alias("n_toks"),
        F.size(F.array_distinct(toks)).alias("n_uniq"),
        F.concat_ws("|", F.slice(F.array_sort(F.array_distinct(toks)), 1, 3)).alias(
            "first3_uniq"
        ),
        F.array_contains(toks, "the").alias("has_the"),
        F.element_at(toks, -1).alias("last_tok"),
        F.array_max(toks).alias("max_tok"),
        F.concat_ws("|", F.slice(toks, 1, 2)).alias("head_join"),
    )


# --------------------------------------------------------------------------
# Table-reconciliation checksum: order-insensitive per-group digest
# (bit_xor of a portable 60-bit row hash) + row count. The replica-
# consistency / migration-audit primitive: two copies of a 100 TB table
# compare by exchanging a few grouped checksums instead of rows. XOR keeps
# everything in int64 (no wide-decimal sums), is commutative (shuffle-order
# free), and maps partial -> final like any algebraic aggregate. Doubles are
# excluded from the digest on purpose: canonical string formatting of
# floats is engine-specific.
@query(
    "rel_table_checksum",
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS n_rows,
               bit_xor(CAST(CAST('0x' || substr(md5(concat_ws('|',
                   o_orderkey, o_custkey, o_orderstatus,
                   strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'))), 1, 15)
                   AS UBIGINT) AS BIGINT)) AS checksum
        FROM orders
        GROUP BY o_orderpriority
    """,
)
def rel_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import stable_hash60

    o = load_table(spark, sf_dir, "orders")
    digest = stable_hash60(
        F.concat_ws(
            "|",
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"),
        )
    )
    return o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_rows"),
        F.bit_xor(digest).alias("checksum"),
    )


# --------------------------------------------------------------------------
# One-pass table profiler — the data-quality primitive run before any 100 TB
# job: per-column null counts, distinct counts, and key/date ranges, all in
# a single scan + single aggregate (partial+final). count(DISTINCT a, b)
# two-column forms are avoided so the whole profile stays one hash-agg pass
# per distinct target with AQE handling the expand.
@query(
    "rel_profile_orders",
    oracle="""
        SELECT COUNT(*) AS n_rows,
               COUNT(*) - COUNT(o_custkey) AS null_custkey,
               COUNT(*) - COUNT(o_orderstatus) AS null_status,
               COUNT(DISTINCT o_custkey) AS distinct_custkey,
               COUNT(DISTINCT o_orderstatus) AS distinct_status,
               COUNT(DISTINCT o_orderpriority) AS distinct_priority,
               MIN(o_orderkey) AS min_orderkey, MAX(o_orderkey) AS max_orderkey,
               MIN(o_orderdate) AS min_date, MAX(o_orderdate) AS max_date
        FROM orders
    """,
)
def rel_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.count("*").alias("n_rows"),
        (F.count("*") - F.count("o_custkey")).alias("null_custkey"),
        (F.count("*") - F.count("o_orderstatus")).alias("null_status"),
        F.count_distinct("o_custkey").alias("distinct_custkey"),
        F.count_distinct("o_orderstatus").alias("distinct_status"),
        F.count_distinct("o_orderpriority").alias("distinct_priority"),
        F.min("o_orderkey").alias("min_orderkey"),
        F.max("o_orderkey").alias("max_orderkey"),
        F.min("o_orderdate").alias("min_date"),
        F.max("o_orderdate").alias("max_date"),
    )


# --------------------------------------------------------------------------
# Equi-width histogram — fixed [0, 500k) price range in 20 bins; bin id is
# floor(x / w) on identical IEEE doubles, so both engines bin identically.
# One shuffle on the 20-value bin key; the out-of-range tail is clamped to
# the edge bins (the standard profiler contract).
@query(
    "rel_histogram_price",
    oracle="""
        SELECT GREATEST(LEAST(CAST(floor(o_totalprice / 25000.0) AS BIGINT),
                              19), 0) AS bin,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE)
                   AS total
        FROM orders
        GROUP BY 1
    """,
)
def rel_histogram_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    bin_ = F.greatest(
        F.least(F.floor(F.col("o_totalprice") / 25000.0), F.lit(19)), F.lit(0)
    )
    return o.groupBy(bin_.alias("bin")).agg(
        F.count("*").alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(27,6)"))
        .cast("double")
        .alias("total"),
    )


# --------------------------------------------------------------------------
# Full outer join — the reconciliation shape (rows on either side only, or
# both): active buyers (have orders) FULL OUTER high-balance customers.
# Both inputs pre-aggregate/filter to small keyed sets before the join, so
# the full outer is one co-partitioned shuffle on c_custkey.
@query(
    "rel_join_full_outer",
    oracle="""
        WITH buyers AS (
            SELECT o_custkey AS custkey, COUNT(*) AS n_orders
            FROM orders GROUP BY o_custkey
        ),
        rich AS (
            SELECT c_custkey AS custkey, c_acctbal
            FROM customer WHERE c_acctbal > 9000.0
        )
        SELECT COALESCE(b.custkey, r.custkey) AS custkey,
               b.n_orders, r.c_acctbal,
               CASE WHEN b.custkey IS NULL THEN 'rich_only'
                    WHEN r.custkey IS NULL THEN 'buyer_only'
                    ELSE 'both' END AS side
        FROM buyers b FULL OUTER JOIN rich r ON r.custkey = b.custkey
    """,
)
def rel_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    buyers = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("b_custkey"))
        .agg(F.count("*").alias("n_orders"))
    )
    rich = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000.0)
        .select(F.col("c_custkey").alias("r_custkey"), "c_acctbal")
    )
    return buyers.join(
        rich, F.col("r_custkey") == F.col("b_custkey"), "full_outer"
    ).select(
        F.coalesce("b_custkey", "r_custkey").alias("custkey"),
        "n_orders",
        "c_acctbal",
        F.when(F.col("b_custkey").isNull(), "rich_only")
        .when(F.col("r_custkey").isNull(), "buyer_only")
        .otherwise("both")
        .alias("side"),
    )


# --------------------------------------------------------------------------
# Referential-integrity audit — orphan counts across every FK edge of the
# schema, the data-quality gate a warehouse runs after each load (the
# reference's ClickHouse tables have no FK enforcement, so this check is
# the only way its schema integrity is ever verified). Each edge is a
# LEFT ANTI probe of the child against the parent key set: Spark plans the
# small-parent edges (nation/region/customer at TPC-H ratios) as broadcast
# anti-joins, so the fact tables never shuffle; the result is one row per
# edge — constant-size output at any SF. All counts are exact integers.
_FK_EDGES = (
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation->region", "nation", "n_regionkey", "region", "r_regionkey"),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
)


@query(
    "rel_fk_orphan_audit",
    oracle="\nUNION ALL\n".join(
        f"""
        SELECT '{edge}' AS edge,
               (SELECT COUNT(*) FROM {child}) AS n_child,
               (SELECT COUNT(*) FROM {child} c
                WHERE NOT EXISTS (SELECT 1 FROM {parent} p
                                  WHERE p.{pkey} = c.{ckey})) AS n_orphans
        """
        for edge, child, ckey, parent, pkey in _FK_EDGES
    ),
)
def rel_fk_orphan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for edge, child, ckey, parent, pkey in _FK_EDGES:
        c = load_table(spark, sf_dir, child)
        p = load_table(spark, sf_dir, parent).select(pkey)
        orphans = (
            c.join(p, c[ckey] == p[pkey], "left_anti")
            .agg(F.count("*").alias("n_orphans"))
        )
        row = (
            c.agg(F.count("*").alias("n_child"))
            .crossJoin(orphans)
            .select(F.lit(edge).alias("edge"), "n_child", "n_orphans")
        )
        out = row if out is None else out.unionByName(row)
    return out


# --------------------------------------------------------------------------
# Partition-skew audit — the diagnostic that decides WHEN the salted-join /
# salted-agg machinery (rel_salted_hot_agg, rel_salted_skew_join) is worth
# deploying: per-key row counts reduced to key count, max, skew ratio
# (max / mean — an exact integer ratio, no rounding needed), and the
# hottest key with deterministic tie-break (lexicographic max of
# (count, key)). Two aggregates: the per-key counts shuffle once with
# map-side partial combine, the stats rollup is a single row.
@query(
    "rel_partition_skew_audit",
    oracle="""
        WITH c AS (
            SELECT o_custkey, COUNT(*) AS n
            FROM orders GROUP BY o_custkey
        )
        SELECT COUNT(*) AS n_keys,
               CAST(SUM(n) AS BIGINT) AS total_rows,
               MAX(n) AS max_per_key,
               CAST(MAX(n) AS DOUBLE) * COUNT(*) / SUM(n) AS skew_ratio,
               (SELECT o_custkey FROM c
                ORDER BY n DESC, o_custkey DESC LIMIT 1) AS hottest_key
        FROM c
    """,
)
def rel_partition_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = o.groupBy("o_custkey").agg(F.count("*").alias("n"))
    return c.agg(
        F.count("*").alias("n_keys"),
        F.sum("n").cast("bigint").alias("total_rows"),
        F.max("n").alias("max_per_key"),
        (
            F.max("n").cast("double") * F.count("*") / F.sum("n")
        ).alias("skew_ratio"),
        F.max(F.struct("n", "o_custkey"))["o_custkey"].alias("hottest_key"),
    )


# --------------------------------------------------------------------------
# Delete-cascade (right-to-be-forgotten) audit — given a deletion set of
# customers (deterministic here: every 97th key), measure the blast radius
# BEFORE executing: rows to purge per table along the FK chain
# (customer -> orders -> lineitem) and what remains. The probe chain is
# semi-joins keyed exactly like the FK edges, so the big tables shuffle on
# their join keys once each and the deletion set stays a broadcast; at
# 100 TB this plan IS the delete plan (anti-join rewrite), so the audit
# costs what one dry run costs. All counts exact.
@query(
    "rel_delete_cascade_audit",
    oracle="""
        WITH del AS (
            SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0
        ),
        del_orders AS (
            SELECT o_orderkey FROM orders
            WHERE o_custkey IN (SELECT c_custkey FROM del)
        )
        SELECT 'customer' AS tbl,
               (SELECT COUNT(*) FROM del) AS n_delete,
               (SELECT COUNT(*) FROM customer) AS n_total
        UNION ALL
        SELECT 'orders',
               (SELECT COUNT(*) FROM del_orders),
               (SELECT COUNT(*) FROM orders)
        UNION ALL
        SELECT 'lineitem',
               (SELECT COUNT(*) FROM lineitem
                WHERE l_orderkey IN (SELECT o_orderkey FROM del_orders)),
               (SELECT COUNT(*) FROM lineitem)
    """,
)
def rel_delete_cascade_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    del_c = cust.filter(F.col("c_custkey") % 97 == 0).select("c_custkey")
    del_o = orders.join(
        F.broadcast(del_c),
        orders["o_custkey"] == del_c["c_custkey"],
        "left_semi",
    ).select("o_orderkey")
    del_l = li.join(
        del_o, li["l_orderkey"] == del_o["o_orderkey"], "left_semi"
    )

    def row(tbl, deleted, total):
        return (
            deleted.agg(F.count("*").alias("n_delete"))
            .crossJoin(total.agg(F.count("*").alias("n_total")))
            .select(F.lit(tbl).alias("tbl"), "n_delete", "n_total")
        )

    return (
        row("customer", del_c, cust)
        .unionByName(row("orders", del_o, orders))
        .unionByName(row("lineitem", del_l, li))
    )
