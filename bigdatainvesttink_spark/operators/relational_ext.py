"""Relational-core extensions (SURVEY.md §2-D7 completeness): range join,
pivot, full window-analytic suite, scalar function library, correlated
scalar subqueries, and NULL-handling semantics — each oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..fixtures import oracle_on_domain, domain_table
from ..functions import dsum
from ..io import load_table
from ..registry import query


# --------------------------------------------------------------------------
# Range join: every trade joined to its instrument's candle by time
# CONTAINMENT. The scalable formulation BUCKETIZES the range key: each
# probe row maps to its candidate bucket (here: the hour, since candles are
# hour-aligned; unaligned intervals would explode k candidate buckets), so
# the join is equi on (company, bucket) with the range as cheap residual —
# per-key work is O(output), not O(|trades per key| x |candles per key|).
# Joining on company alone measured 20s at sf0.1; bucketized, sub-second.
@query(
    "rel_range_join",
    oracle=oracle_on_domain(
        """
        SELECT t.company_id, t.trade_id, t.price, c.ts AS candle_ts,
               c.open, c.close
        FROM trades t
        JOIN candles c
          ON t.company_id = c.company_id
         AND t.ts >= c.ts
         AND t.ts < c.ts + INTERVAL 1 HOUR
        """
    ),
)
def rel_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = domain_table(spark, sf_dir, "trades")
    c = domain_table(spark, sf_dir, "candles").select(
        F.col("company_id").alias("c_company_id"),
        F.col("ts").alias("candle_ts"),
        "open",
        "close",
    )
    return t.withColumn("__bucket", F.date_trunc("hour", "ts")).join(
        c,
        (F.col("company_id") == F.col("c_company_id"))
        & (F.col("__bucket") == F.col("candle_ts"))
        & (F.col("ts") >= F.col("candle_ts"))
        & (F.col("ts") < F.col("candle_ts") + F.expr("INTERVAL 1 HOUR")),
    ).select(
        "company_id", "trade_id", "price", "candle_ts", "open", "close"
    )


# --------------------------------------------------------------------------
# Pivot: order counts per (custkey-bucket) x orderstatus — pivot is a
# groupBy with a fixed column list, planned as a single hash aggregation.
@query(
    "rel_pivot",
    oracle="""
        SELECT o_custkey % 10 AS cust_bucket,
               COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS status_O,
               COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS status_F,
               COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS status_P
        FROM orders
        GROUP BY o_custkey % 10
    """,
)
def rel_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    pivoted = (
        o.withColumn("cust_bucket", F.col("o_custkey") % 10)
        .groupBy("cust_bucket")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
    )
    # pivot leaves missing combinations null; COUNT semantics say 0
    return pivoted.select(
        "cust_bucket",
        F.coalesce(F.col("O"), F.lit(0)).alias("status_O"),
        F.coalesce(F.col("F"), F.lit(0)).alias("status_F"),
        F.coalesce(F.col("P"), F.lit(0)).alias("status_P"),
    )


# --------------------------------------------------------------------------
# Window analytic suite: ntile / percent_rank / cume_dist / nth_value /
# first+last over an explicit ROWS frame, all under one deterministic order.
@query(
    "rel_window_analytics",
    oracle="""
        SELECT c_custkey, c_nationkey, c_acctbal,
               NTILE(4) OVER w AS quartile,
               PERCENT_RANK() OVER w AS pct_rank,
               CUME_DIST() OVER w AS cume,
               FIRST_VALUE(c_custkey) OVER w AS richest_custkey,
               NTH_VALUE(c_custkey, 2) OVER (PARTITION BY c_nationkey
                   ORDER BY c_acctbal DESC, c_custkey ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                   AS second_custkey,
               LAST_VALUE(c_custkey) OVER (PARTITION BY c_nationkey
                   ORDER BY c_acctbal DESC, c_custkey ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                   AS poorest_custkey
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC)
    """,
)
def rel_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return c.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.ntile(4).over(w).alias("quartile"),
        # no rounding: both are exact-integer-ratio divisions, already
        # bit-identical cross-engine — round6 actually BROKE parity at
        # sf0.1 where (rank-1)/(n-1) can be an exactly-representable half
        # (e.g. 0.5203125), which Spark HALF_UPs and DuckDB rounds down
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.first("c_custkey").over(w).alias("richest_custkey"),
        F.nth_value("c_custkey", 2).over(w_full).alias("second_custkey"),
        F.last("c_custkey").over(w_full).alias("poorest_custkey"),
    )


# --------------------------------------------------------------------------
# RANGE frame: per part-type, sum of retail prices over a +/-5 size band
# around each part's size (value-based frame, not row-based).
@query(
    "rel_window_range_frame",
    oracle="""
        SELECT p_partkey, p_type, p_size,
               CAST(SUM(CAST(p_retailprice AS DECIMAL(27,6))) OVER (
                   PARTITION BY p_type ORDER BY p_size
                   RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING
               ) AS DOUBLE) AS band_price_sum
        FROM part
    """,
)
def rel_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    w = (
        Window.partitionBy("p_type")
        .orderBy(F.col("p_size"))
        .rangeBetween(-5, 5)
    )
    return p.select(
        "p_partkey",
        "p_type",
        "p_size",
        F.sum(F.col("p_retailprice").cast("decimal(27,6)"))
        .over(w)
        .cast("double")
        .alias("band_price_sum"),
    )


# --------------------------------------------------------------------------
# Scalar function suite: portable string/date/math library over one
# projection (the "scalar fn library" row of SURVEY §2-D7).
@query(
    "rel_scalar_suite",
    oracle="""
        SELECT c_custkey,
               upper(c_name) AS up_name,
               lower(c_mktsegment) AS lo_seg,
               length(c_name) AS name_len,
               substring(c_name, 1, 8) AS name_prefix,
               replace(c_name, '#', '-') AS name_repl,
               lpad(CAST(c_nationkey AS STRING), 4, '0') AS nation_padded,
               trim('  x  ') AS trimmed,
               abs(c_acctbal) AS abs_bal,
               CAST(ceil(c_acctbal) AS DOUBLE) AS ceil_bal,
               CAST(floor(c_acctbal) AS DOUBLE) AS floor_bal,
               sqrt(abs(c_acctbal)) AS sqrt_bal,
               greatest(c_acctbal, 0.0) AS pos_bal,
               least(c_acctbal, 0.0) AS neg_bal,
               coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other
        FROM customer
    """,
)
def rel_scalar_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("up_name"),
        F.lower("c_mktsegment").alias("lo_seg"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("name_repl"),
        F.lpad(F.col("c_nationkey").cast("string"), 4, "0").alias("nation_padded"),
        F.trim(F.lit("  x  ")).alias("trimmed"),
        F.abs("c_acctbal").alias("abs_bal"),
        F.ceil("c_acctbal").cast("double").alias("ceil_bal"),
        F.floor("c_acctbal").cast("double").alias("floor_bal"),
        F.sqrt(F.abs("c_acctbal")).alias("sqrt_bal"),
        F.greatest("c_acctbal", F.lit(0.0)).alias("pos_bal"),
        F.least("c_acctbal", F.lit(0.0)).alias("neg_bal"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg_or_other"
        ),
    )


# --------------------------------------------------------------------------
# Date/time function suite over order dates.
@query(
    "rel_datetime_suite",
    oracle="""
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS INT) AS y,
               CAST(month(o_orderdate) AS INT) AS m,
               CAST(day(o_orderdate) AS INT) AS d,
               CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
               o_orderdate + INTERVAL 90 DAY AS due_date,
               CAST(o_orderdate AS DATE) AS as_date
        FROM orders
    """,
)
def rel_datetime_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("y"),
        F.month("o_orderdate").cast("int").alias("m"),
        F.dayofmonth("o_orderdate").cast("int").alias("d"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")).alias("due_date"),
        F.col("o_orderdate").cast("date").alias("as_date"),
    )


# --------------------------------------------------------------------------
# Correlated scalar subquery: each order vs its customer's average order
# value (decorrelated by Catalyst into a join against a pre-aggregate).
@query(
    "rel_correlated_scalar_subquery",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice,
               CASE WHEN o_totalprice > (
                   SELECT CAST(SUM(CAST(i.o_totalprice AS DECIMAL(27,6))) AS DOUBLE)
                          / COUNT(*)
                   FROM orders i WHERE i.o_custkey = o.o_custkey
               ) THEN 1 ELSE 0 END AS above_own_avg
        FROM orders o
    """,
)
def rel_correlated_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice,
               CASE WHEN o_totalprice > (
                   SELECT CAST(SUM(CAST(i.o_totalprice AS DECIMAL(27,6))) AS DOUBLE)
                          / COUNT(*)
                   FROM orders i WHERE i.o_custkey = o.o_custkey
               ) THEN 1 ELSE 0 END AS above_own_avg
        FROM orders o
        """
    )


# --------------------------------------------------------------------------
# IN / NOT IN subqueries (planned as semi/anti joins after rewrite) plus
# conditional aggregation in one result.
@query(
    "rel_in_subquery_conditional_agg",
    oracle=f"""
        SELECT n_name,
               COUNT(*) AS n_customers,
               COUNT(CASE WHEN c_acctbal > 0 THEN 1 END) AS n_positive,
               CAST(SUM(CAST(CASE WHEN c_acctbal > 0 THEN c_acctbal
                                  ELSE 0.0 END AS DECIMAL(27,6))) AS DOUBLE)
                   AS positive_bal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        WHERE c_custkey IN (SELECT o_custkey FROM orders
                            WHERE o_totalprice > 150000.0)
        GROUP BY n_name
    """,
)
def rel_in_subquery_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 150000.0
    )
    pos = F.when(F.col("c_acctbal") > 0, F.col("c_acctbal")).otherwise(0.0)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.count(F.when(F.col("c_acctbal") > 0, 1)).alias("n_positive"),
            dsum(pos, "positive_bal"),
        )
    )


# --------------------------------------------------------------------------
# Set operations, ALL variants: multiset semantics (duplicates preserved) —
# the multiset complement of rel_set_ops' DISTINCT semantics.
@query(
    "rel_set_ops_all",
    oracle="""
        SELECT 'intersect_all' AS op, k FROM (
            SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
            INTERSECT ALL
            SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
        ) i
        UNION ALL
        SELECT 'except_all' AS op, k FROM (
            SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
            EXCEPT ALL
            SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
        ) e
    """,
)
def rel_set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    open_k = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("k")
    )
    done_k = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("k")
    )
    tag = lambda df, name: df.select(F.lit(name).alias("op"), "k")  # noqa: E731
    return tag(open_k.intersectAll(done_k), "intersect_all").unionByName(
        tag(open_k.exceptAll(done_k), "except_all")
    )


# --------------------------------------------------------------------------
# Unpivot (wide -> long): per-part numeric attributes melted to rows via
# the stack/unpivot pattern.
@query(
    "rel_unpivot",
    oracle="""
        SELECT p_partkey, 'p_size' AS attr, CAST(p_size AS DOUBLE) AS val
        FROM part
        UNION ALL
        SELECT p_partkey, 'p_retailprice', p_retailprice FROM part
    """,
)
def rel_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        "p_retailprice",
    ).unpivot("p_partkey", ["p_size", "p_retailprice"], "attr", "val")


# --------------------------------------------------------------------------
# Salted two-phase aggregation: GROUP BY over a pathologically hot key —
# lineitem has only 3 l_returnflag values, so a direct aggregation funnels
# ~N/3 rows into each of 3 reducers regardless of cluster size. The salted
# plan (functions/skew.py) splits each key across 16 salt sub-keys,
# pre-aggregates, then combines: the hot reducer becomes 16 parallel ones.
# Decimal addition is associative, so the result is bit-identical to the
# direct plan (and to the unsalted DuckDB oracle).
@query(
    "rel_salted_hot_agg",
    oracle="""
        SELECT l_returnflag,
               CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE)
                   AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE)
                   AS sum_price,
               COUNT(*) AS n_rows
        FROM lineitem
        GROUP BY l_returnflag
    """,
)
def rel_salted_hot_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.skew import salted_sum_count

    li = load_table(spark, sf_dir, "lineitem")
    return salted_sum_count(
        li,
        ["l_returnflag"],
        {"sum_qty": "l_quantity", "sum_price": "l_extendedprice"},
        n_salts=16,
    )


# --------------------------------------------------------------------------
# Salted replicate join — the skew mitigation for JOINS (the aggregation
# arm is rel_salted_hot_agg). The fact side's join key is massively skewed
# (l_returnflag: 3 distinct values over the whole table), so a plain
# shuffle join funnels each key into one reducer. The fix: fact rows get a
# deterministic salt (l_orderkey % 16), the other side is replicated once
# per salt value, and the join runs on (key, salt) — every hot key fans
# out over 16 reducers. The merge hint pins the shuffle join (a 3-row dim
# would trivially broadcast — the pattern matters when the replicated side
# is too big to broadcast but far smaller than the fact, e.g. a skewed
# fact-fact join on a low-cardinality key). AQE's skew-join handles the
# sorted-merge case adaptively; the salt is the portable, plan-stable form.
_N_SALT = 16


@query(
    "rel_salted_skew_join",
    oracle="""
        WITH dim AS (
            SELECT DISTINCT l_returnflag AS flag,
                   ascii(l_returnflag) AS flag_code
            FROM lineitem
        )
        SELECT d.flag, d.flag_code, COUNT(*) AS n_lines,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(27,6))) AS DOUBLE)
                   AS revenue
        FROM lineitem l JOIN dim d ON l.l_returnflag = d.flag
        GROUP BY d.flag, d.flag_code
    """,
)
def rel_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    fact = li.select(
        F.col("l_returnflag").alias("flag"),
        "l_extendedprice",
        (F.col("l_orderkey") % _N_SALT).alias("__salt"),
    )
    dim = (
        li.select(F.col("l_returnflag").alias("flag"))
        .distinct()
        .withColumn("flag_code", F.ascii("flag"))
    )
    dim_rep = dim.select(
        "flag",
        "flag_code",
        F.explode(F.sequence(F.lit(0), F.lit(_N_SALT - 1))).alias("__salt"),
    )
    joined = fact.hint("merge").join(dim_rep, ["flag", "__salt"])
    return joined.groupBy("flag", "flag_code").agg(
        F.count("*").alias("n_lines"),
        F.sum(F.col("l_extendedprice").cast("decimal(27,6)"))
        .cast("double")
        .alias("revenue"),
    )


# --------------------------------------------------------------------------
# Equi-depth (equi-height) histogram — the optimizer/statistics primitive:
# bucket boundaries at the exact 10/20/.../90th percentile_disc values
# (actual data points, bit-exact on both engines — SQL-standard
# CUME_DIST >= p element), then one broadcast pass bins every row. At
# 100 TB the boundary step swaps to approx_percentile (the exact form
# buffers the column per group); the binning pass — the expensive part —
# is identical either way: scan + tiny broadcast, no shuffle of the fact.
@query(
    "rel_equidepth_histogram",
    oracle="""
        WITH b AS (
            SELECT quantile_disc(o_totalprice,
                [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS bs
            FROM orders
        )
        SELECT len(list_filter(b.bs, x -> o.o_totalprice > x)) AS bucket,
               COUNT(*) AS n_rows,
               MIN(o.o_totalprice) AS lo,
               MAX(o.o_totalprice) AS hi
        FROM orders o, b
        GROUP BY 1
    """,
)
def rel_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    bounds = o.agg(
        F.expr(
            "array("
            + ",".join(
                f"percentile_disc(0.{k}) WITHIN GROUP (ORDER BY o_totalprice)"
                for k in range(1, 10)
            )
            + ") AS bs"
        )
    )
    binned = o.crossJoin(F.broadcast(bounds)).select(
        "o_totalprice",
        F.size(
            F.filter("bs", lambda x: F.col("o_totalprice") > x)
        ).alias("bucket"),
    )
    return binned.groupBy("bucket").agg(
        F.count("*").alias("n_rows"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
    )


# --------------------------------------------------------------------------
# Gaps and islands: contiguous runs of daily activity per user — the
# classic sequential-SQL pattern (streaks, outage windows, coverage spans)
# the reference's warehouse would answer with ClickHouse window funcs. The
# island key is daynum - row_number(): constant within a consecutive run,
# jumps at every gap — pure integer arithmetic, bit-exact cross-engine
# (days are ints; no date rendering in the output). Plan: the distinct-day
# aggregate shuffles on (user, day) with map-side partial combine (events
# >> active days), then the window + island rollup share one (user_id)
# partitioning; both post-distinct stages work on the compacted day set,
# so the expensive cardinality never shuffles twice.
@query(
    "rel_gaps_islands",
    oracle="""
        SELECT user_id,
               daynum - rn AS island_key,
               MIN(daynum) AS start_day,
               MAX(daynum) AS end_day,
               COUNT(*) AS island_len
        FROM (
            SELECT user_id, daynum,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY daynum ASC) AS rn
            FROM (
                SELECT DISTINCT user_id,
                       date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                           AS daynum
                FROM events
            ) days
        ) seq
        GROUP BY user_id, daynum - rn
    """,
)
def rel_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    days = (
        e.select(
            "user_id",
            F.datediff(
                F.to_date("ts"), F.to_date(F.lit("1970-01-01"))
            ).alias("daynum"),
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy(F.col("daynum").asc())
    seq = days.withColumn(
        "island_key", F.col("daynum") - F.row_number().over(w)
    )
    return seq.groupBy("user_id", "island_key").agg(
        F.min("daynum").alias("start_day"),
        F.max("daynum").alias("end_day"),
        F.count("*").alias("island_len"),
    )


# --------------------------------------------------------------------------
# Linear-counting distinct estimation — the bitmap-occupancy sketch
# (Whang et al.), the deterministic cousin of HLL: bucket = md5-hash mod m,
# estimate = -m * ln(1 - occupied/m). Because the hash is the engine-
# portable 60-bit md5 prefix (functions/text.py spelling), the sketch and
# its error are bit-reproducible and oracle-EXACT — unlike
# approx_count_distinct (rel_approx_aggs), which is rows-only-checkable.
# Scale: the (group, bucket) grid is bounded by m per group and partial-
# aggregates map-side; m sizes with expected cardinality (65536 here keeps
# occupancy < 25% through sf1 — at higher cardinality widen m or shard the
# hash space, same plan). ln() of the same double on both engines; round6.
_LC_M = 65536


@query(
    "rel_linear_counting_distinct",
    oracle=f"""
        SELECT o_orderstatus,
               COUNT(DISTINCT o_custkey) AS true_distinct,
               COUNT(DISTINCT bucket) AS occupied,
               ROUND(-{_LC_M} * ln(1 - CAST(COUNT(DISTINCT bucket) AS DOUBLE)
                                       / {_LC_M}), 6) AS lc_estimate,
               ROUND(ABS(-{_LC_M} * ln(1 - CAST(COUNT(DISTINCT bucket)
                                                AS DOUBLE) / {_LC_M})
                         - COUNT(DISTINCT o_custkey))
                     / COUNT(DISTINCT o_custkey), 6) AS abs_rel_err
        FROM (
            SELECT o_orderstatus, o_custkey,
                   CAST(CAST('0x' || substr(md5(CAST(o_custkey AS VARCHAR)),
                                            1, 15) AS UBIGINT) AS BIGINT)
                       % {_LC_M} AS bucket
            FROM orders
        ) h
        GROUP BY o_orderstatus
    """,
)
def rel_linear_counting_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import stable_hash60

    o = load_table(spark, sf_dir, "orders")
    h = o.select(
        "o_orderstatus",
        "o_custkey",
        (stable_hash60(F.col("o_custkey").cast("string")) % _LC_M).alias(
            "bucket"
        ),
    )
    occ = F.countDistinct("bucket")
    est = -F.lit(float(_LC_M)) * F.log(
        1 - occ.cast("double") / _LC_M
    )
    return h.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("true_distinct"),
        occ.alias("occupied"),
        F.round(est, 6).alias("lc_estimate"),
        F.round(
            F.abs(est - F.countDistinct("o_custkey"))
            / F.countDistinct("o_custkey"),
            6,
        ).alias("abs_rel_err"),
    )


# --------------------------------------------------------------------------
# Windowed DISTINCT aggregate — COUNT(DISTINCT) over a moving frame, which
# Spark's window functions reject outright ("Distinct window functions are
# not supported"): expressed instead as size(array_distinct(collect_list))
# over the frame. Correct for BOUNDED frames (the 20-row frame here
# carries <= 20 values per row); an unbounded-frame distinct would buffer
# the whole partition — use the groupBy path then. The oracle uses
# DuckDB's list machinery over the same frame. Exact integers; one
# shuffle on the partition key.
@query(
    "rel_window_distinct_count",
    oracle="""
        SELECT o_custkey, o_orderkey,
               len(list_distinct(statuses)) AS distinct_statuses_20,
               len(statuses) AS frame_rows
        FROM (
            SELECT o_custkey, o_orderkey,
                   array_agg(o_orderstatus) OVER (
                       PARTITION BY o_custkey ORDER BY o_orderkey ASC
                       ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
                       AS statuses
            FROM orders
        ) framed
    """,
)
def rel_window_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderkey").asc())
        .rowsBetween(-19, 0)
    )
    framed = o.select(
        "o_custkey",
        "o_orderkey",
        F.collect_list("o_orderstatus").over(w).alias("statuses"),
    )
    return framed.select(
        "o_custkey",
        "o_orderkey",
        F.size(F.array_distinct("statuses")).alias("distinct_statuses_20"),
        F.size("statuses").alias("frame_rows"),
    )


# --------------------------------------------------------------------------
# Hierarchy traversal + subtree rollup — the recursive-CTE workload
# (org charts, BOM explosion, category trees) Spark lacks a native
# operator for: a parent-pointer table (parent(k) = k div 10, a 5-level
# tree over the part keys — an arbitrary adjacency list works the same)
# walked root-ward by ITERATED JOINS against the parent table, unrolled to
# the fixture's max depth +1; the oracle is DuckDB's native WITH RECURSIVE
# on the identical adjacency. Each round joins the frontier to the parent
# table on the current ancestor (broadcast — the parent table is the
# dimension itself) and stops moving once a root is reached, so the
# per-round work only shrinks. Rollup: per root subtree, part count, max
# depth, decimal-routed retail value.
_HIER_ROUNDS = 6


@query(
    "rel_hierarchy_rollup",
    oracle="""
        WITH RECURSIVE walk(k, anc, depth) AS (
            SELECT p_partkey, p_partkey, 0 FROM part
            UNION ALL
            SELECT w.k, w.anc // 10, w.depth + 1
            FROM walk w WHERE w.anc >= 10
        ),
        rooted AS (
            SELECT k, anc AS root, depth
            FROM walk WHERE anc < 10
        )
        SELECT r.root,
               COUNT(*) AS n_parts,
               MAX(r.depth) AS max_depth,
               CAST(SUM(CAST(p.p_retailprice AS DECIMAL(27,6))) AS DOUBLE)
                   AS subtree_retail
        FROM rooted r JOIN part p ON p.p_partkey = r.k
        GROUP BY r.root
    """,
)
def rel_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    parents = p.select(
        F.col("p_partkey").alias("child"),
        F.expr("p_partkey div 10").alias("parent"),
    )
    walk = p.select(
        F.col("p_partkey").alias("k"),
        F.col("p_partkey").alias("anc"),
        F.lit(0).alias("depth"),
    )
    # No broadcast hint: a parent table is dimension-sized for org charts
    # but fact-sized for catalog/BOM hierarchies — AQE picks broadcast when
    # it fits and a co-partitioned shuffle join (stable anc key across
    # rounds) when it doesn't.
    for _ in range(_HIER_ROUNDS):
        walk = (
            walk.join(
                parents,
                walk["anc"] == parents["child"],
                "left",
            )
            .select(
                "k",
                F.when(F.col("anc") >= 10, F.col("parent"))
                .otherwise(F.col("anc"))
                .alias("anc"),
                F.when(F.col("anc") >= 10, F.col("depth") + 1)
                .otherwise(F.col("depth"))
                .alias("depth"),
            )
        )
    rooted = walk.filter(F.col("anc") < 10)
    return (
        rooted.join(p, rooted["k"] == p["p_partkey"])
        .groupBy(F.col("anc").alias("root"))
        .agg(
            F.count("*").alias("n_parts"),
            F.max("depth").alias("max_depth"),
            dsum("p_retailprice", "subtree_retail"),
        )
    )


# --------------------------------------------------------------------------
# Sweep-line interval concurrency — how many orders are "open" on any
# given day, treating each order as a 30-day interval from o_orderdate.
# The scale-defining choice: NOT an interval self-join (O(n * k) pairs)
# and NOT a row-level global sort. Start/end events are first
# partial-aggregated to per-day deltas — a map-side-combined shuffle that
# collapses any data volume to the calendar grain (~2.5k rows for seven
# years) — and only that constant-bounded series flows through the
# running-sum window. The same two-level trick (coarse pre-aggregation,
# then an ordered scan of a bounded series) is how a 100 TB event table
# gets a concurrency profile without a global sort of raw rows.
@query(
    "rel_interval_sweep",
    oracle="""
        WITH deltas AS (
            SELECT day, SUM(delta) AS delta FROM (
                SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP)
                           AS day,
                       1 AS delta
                FROM orders
                UNION ALL
                SELECT CAST(date_trunc('day', o_orderdate)
                            + INTERVAL 30 DAY AS TIMESTAMP) AS day,
                       -1 AS delta
                FROM orders
            ) ev
            GROUP BY day
        )
        SELECT day, CAST(delta AS BIGINT) AS net_change,
               CAST(SUM(delta) OVER (ORDER BY day ASC) AS BIGINT)
                   AS n_open
        FROM deltas
    """,
)
def rel_interval_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    day = F.date_trunc("day", F.col("o_orderdate")).cast("timestamp")
    starts = o.select(day.alias("day"), F.lit(1).alias("delta"))
    ends = o.select(
        F.date_trunc("day", F.col("o_orderdate"))
        .cast("timestamp")
        .alias("d0"),
        F.lit(-1).alias("delta"),
    ).select(
        (F.col("d0") + F.expr("INTERVAL 30 DAYS")).alias("day"), "delta"
    )
    deltas = (
        starts.unionAll(ends)
        .groupBy("day")
        .agg(F.sum("delta").alias("delta"))
    )
    w = Window.orderBy(F.col("day").asc())
    return deltas.select(
        "day",
        F.col("delta").cast("bigint").alias("net_change"),
        F.sum("delta").over(w).cast("bigint").alias("n_open"),
    )


# --------------------------------------------------------------------------
# Data-quality expectations report — the declarative check suite a
# warehouse runs before publishing a table: row volume, null keys, value
# ranges, domain membership, key uniqueness, and referential integrity,
# emitted as one long-format (check, n_violations, passed) report. Plan
# shape: every per-row check folds into ONE conditional-aggregate scan of
# orders (no per-check passes over the fact table); the FK orphan check
# is the only join — a LEFT ANTI against the customer dimension that AQE
# broadcasts, counted by the same single-row aggregate. At 100 TB this is
# one fact scan + one broadcast anti-join, total.
@query(
    "rel_expectations_report",
    oracle="""
        WITH scan AS (
            SELECT COUNT(*) AS n_rows,
                   COUNT(*) FILTER (WHERE o_custkey IS NULL) AS null_cust,
                   COUNT(*) FILTER (WHERE o_totalprice <= 0) AS bad_price,
                   COUNT(*) FILTER (
                       WHERE o_orderstatus NOT IN ('O', 'F', 'P'))
                       AS bad_status,
                   COUNT(*) FILTER (
                       WHERE o_orderdate < TIMESTAMP '1992-01-01'
                          OR o_orderdate >= TIMESTAMP '1999-01-01')
                       AS bad_date,
                   COUNT(*) - COUNT(DISTINCT o_orderkey) AS dup_keys
            FROM orders
        ),
        orphans AS (
            SELECT COUNT(*) AS n FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey)
        )
        SELECT chk AS check_name, n_violations,
               n_violations = 0 AS passed
        FROM (
            SELECT 'null_custkey' AS chk, null_cust AS n_violations
            FROM scan
            UNION ALL SELECT 'nonpositive_totalprice', bad_price FROM scan
            UNION ALL SELECT 'unknown_orderstatus', bad_status FROM scan
            UNION ALL SELECT 'orderdate_out_of_range', bad_date FROM scan
            UNION ALL SELECT 'duplicate_orderkey', dup_keys FROM scan
            UNION ALL SELECT 'orphan_custkey', n FROM orphans
        ) checks
    """,
)
def rel_expectations_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    cnt = lambda cond: F.count_if(cond)  # noqa: E731
    scan = o.agg(
        cnt(F.col("o_custkey").isNull()).alias("null_cust"),
        cnt(F.col("o_totalprice") <= 0).alias("bad_price"),
        cnt(~F.col("o_orderstatus").isin("O", "F", "P")).alias(
            "bad_status"
        ),
        cnt(
            (F.col("o_orderdate") < F.lit("1992-01-01").cast("timestamp"))
            | (
                F.col("o_orderdate")
                >= F.lit("1999-01-01").cast("timestamp")
            )
        ).alias("bad_date"),
        (F.count("*") - F.countDistinct("o_orderkey")).alias("dup_keys"),
    )
    orphans = (
        o.join(c, o["o_custkey"] == c["c_custkey"], "left_anti")
        .agg(F.count("*").alias("n"))
        .select(F.lit("orphan_custkey").alias("chk"), F.col("n"))
    )
    checks = scan.selectExpr(
        """stack(5,
            'null_custkey', null_cust,
            'nonpositive_totalprice', bad_price,
            'unknown_orderstatus', bad_status,
            'orderdate_out_of_range', bad_date,
            'duplicate_orderkey', dup_keys) AS (chk, n_violations)"""
    ).unionAll(orphans.toDF("chk", "n_violations"))
    return checks.select(
        F.col("chk").alias("check_name"),
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )


# --------------------------------------------------------------------------
# Chi-squared independence test — are order priority and order status
# independent? The categorical counterpart of the Welch t (d6) and KS
# (d4) tests: observed cell counts vs marginal-product expectations,
# summed into the chi2 statistic with its degrees of freedom. The whole
# computation collapses to the (priorities x statuses) GRID after one
# conditional-aggregate scan; expectations are exact-integer products
# divided once in double, and each cell's term is 6dp-gridded before
# the decimal total so the statistic is order-independent.
@query(
    "rel_chi2_independence",
    oracle="""
        WITH cells AS (
            SELECT o_orderpriority AS pr, o_orderstatus AS st,
                   COUNT(*) AS obs
            FROM orders GROUP BY 1, 2
        ),
        rowm AS (SELECT pr, SUM(obs) AS n_pr FROM cells GROUP BY pr),
        colm AS (SELECT st, SUM(obs) AS n_st FROM cells GROUP BY st),
        tot AS (SELECT SUM(obs) AS n FROM cells),
        terms AS (
            SELECT c.pr, c.st,
                   ROUND(
                       (c.obs - CAST(r.n_pr * cl.n_st AS DOUBLE) / t.n)
                       * (c.obs - CAST(r.n_pr * cl.n_st AS DOUBLE) / t.n)
                       / (CAST(r.n_pr * cl.n_st AS DOUBLE) / t.n),
                       6) AS term
            FROM cells c
            JOIN rowm r ON r.pr = c.pr
            JOIN colm cl ON cl.st = c.st
            CROSS JOIN tot t
        ),
        dims AS (
            SELECT (SELECT COUNT(*) FROM rowm) AS n_rows,
                   (SELECT COUNT(*) FROM colm) AS n_cols
        )
        SELECT CAST(SUM(CAST(term AS DECIMAL(27,6))) AS DOUBLE) AS chi2,
               (SELECT (n_rows - 1) * (n_cols - 1) FROM dims) AS dof,
               COUNT(*) AS n_cells
        FROM terms
    """,
)
def rel_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cells = o.groupBy(
        F.col("o_orderpriority").alias("pr"),
        F.col("o_orderstatus").alias("st"),
    ).agg(F.count("*").alias("obs"))
    rowm = cells.groupBy("pr").agg(F.sum("obs").alias("n_pr"))
    colm = cells.groupBy("st").agg(F.sum("obs").alias("n_st"))
    tot = cells.agg(F.sum("obs").alias("n"))
    exp = (F.col("n_pr") * F.col("n_st")).cast("double") / F.col("n")
    terms = (
        cells.join(F.broadcast(rowm), "pr")
        .join(F.broadcast(colm), "st")
        .crossJoin(F.broadcast(tot))
        .select(
            F.round(
                (F.col("obs") - exp) * (F.col("obs") - exp) / exp, 6
            ).alias("term")
        )
    )
    dof = (
        rowm.agg(F.count("*").alias("nr"))
        .crossJoin(colm.agg(F.count("*").alias("nc")))
        .select(((F.col("nr") - 1) * (F.col("nc") - 1)).alias("dof"))
    )
    return (
        terms.agg(
            F.sum(F.col("term").cast("decimal(27,6)"))
            .cast("double")
            .alias("chi2"),
            F.count("*").alias("n_cells"),
        )
        .crossJoin(F.broadcast(dof))
        .select("chi2", "dof", "n_cells")
    )


# --------------------------------------------------------------------------
# Relational division — "customers who ordered in EVERY quarter of
# 1995": the classic FOR-ALL query shape (the one relational operator
# the basic join/filter/aggregate set can't express directly). Both the
# count-equality formulation here and the double-NOT-EXISTS are
# standard; count-equality is the distributed-friendly one (two
# aggregates and a broadcast of the divisor cardinality — no correlated
# subquery per row). Exact integers end to end.
@query(
    "rel_division_all_quarters",
    oracle="""
        WITH quarters AS (
            SELECT DISTINCT CAST(EXTRACT(quarter FROM o_orderdate) AS INT)
                       AS q
            FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1995
        ),
        cust_q AS (
            SELECT DISTINCT o_custkey,
                   CAST(EXTRACT(quarter FROM o_orderdate) AS INT) AS q
            FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1995
        ),
        nq AS (SELECT COUNT(*) AS n_q FROM quarters)
        SELECT c.o_custkey AS custkey, COUNT(*) AS n_quarters
        FROM cust_q c
        GROUP BY c.o_custkey
        HAVING COUNT(*) = (SELECT n_q FROM nq)
    """,
)
def rel_division_all_quarters(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        F.year("o_orderdate") == 1995
    )
    cust_q = o.select(
        "o_custkey", F.quarter("o_orderdate").cast("int").alias("q")
    ).distinct()
    nq = cust_q.select("q").distinct().agg(F.count("*").alias("n_q"))
    return (
        cust_q.groupBy("o_custkey")
        .agg(F.count("*").alias("n_quarters"))
        .crossJoin(F.broadcast(nq))
        .filter(F.col("n_quarters") == F.col("n_q"))
        .select(F.col("o_custkey").alias("custkey"), "n_quarters")
    )


# --------------------------------------------------------------------------
# NOT IN null semantics — the ANSI trap every SQL engine must honor
# identically: `x NOT IN (subquery)` is UNKNOWN (drops ALL rows) the
# moment the subquery yields one NULL, while NOT EXISTS / LEFT ANTI
# ignore the NULL. This row proves the engine keeps all three spellings
# straight by emitting their counts side by side over a probe list that
# deliberately contains a NULL. A semantics-parity row, not a
# performance one; the probe side is grid-sized and broadcast.
@query(
    "rel_not_in_null_semantics",
    oracle="""
        WITH probe AS (
            SELECT o_custkey AS k FROM orders WHERE o_orderkey % 100 = 0
            UNION ALL SELECT NULL
        )
        SELECT
            (SELECT COUNT(*) FROM customer
             WHERE c_custkey NOT IN (SELECT k FROM probe))
                AS n_not_in_with_null,
            (SELECT COUNT(*) FROM customer
             WHERE c_custkey NOT IN (SELECT k FROM probe
                                     WHERE k IS NOT NULL))
                AS n_not_in_filtered,
            (SELECT COUNT(*) FROM customer c
             WHERE NOT EXISTS (SELECT 1 FROM probe p
                               WHERE p.k = c.c_custkey))
                AS n_not_exists
    """,
)
def rel_not_in_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    probe = o.filter(F.col("o_orderkey") % 100 == 0).select(
        F.col("o_custkey").alias("k")
    ).unionAll(
        o.limit(1).select(F.lit(None).cast("long").alias("k"))
    )
    probe.createOrReplaceTempView("probe_keys")
    c.createOrReplaceTempView("customer_v")
    return c.sparkSession.sql(
        """
        SELECT
            (SELECT COUNT(*) FROM customer_v
             WHERE c_custkey NOT IN (SELECT k FROM probe_keys))
                AS n_not_in_with_null,
            (SELECT COUNT(*) FROM customer_v
             WHERE c_custkey NOT IN (SELECT k FROM probe_keys
                                     WHERE k IS NOT NULL))
                AS n_not_in_filtered,
            (SELECT COUNT(*) FROM customer_v c
             WHERE NOT EXISTS (SELECT 1 FROM probe_keys p
                               WHERE p.k = c.c_custkey))
                AS n_not_exists
        """
    )


# --------------------------------------------------------------------------
# Functional-dependency discovery — the schema-profiling probe behind
# normalization advice and key detection: for each candidate
# determinant -> dependent pair, does every determinant value map to
# exactly one dependent value? Violations are measured exactly as
# count(distinct (det, dep)) - count(distinct det) — zero iff the FD
# holds. One aggregate per candidate over a single scan each (the
# candidate list is fixed and tiny; at warehouse scale you'd run the
# same counts through approx_count_distinct first and confirm exact
# only on survivors — noted, not needed at fixture truth-set sizes).
@query(
    "rel_fd_discovery",
    oracle="""
        SELECT 'o_orderkey->o_custkey' AS candidate,
               COUNT(DISTINCT o_orderkey) AS n_det,
               COUNT(DISTINCT (o_orderkey, o_custkey)) AS n_pairs,
               COUNT(DISTINCT (o_orderkey, o_custkey))
                   - COUNT(DISTINCT o_orderkey) = 0 AS fd_holds
        FROM orders
        UNION ALL
        SELECT 'o_custkey->o_orderpriority',
               COUNT(DISTINCT o_custkey),
               COUNT(DISTINCT (o_custkey, o_orderpriority)),
               COUNT(DISTINCT (o_custkey, o_orderpriority))
                   - COUNT(DISTINCT o_custkey) = 0
        FROM orders
        UNION ALL
        SELECT 'c_custkey->c_nationkey',
               COUNT(DISTINCT c_custkey),
               COUNT(DISTINCT (c_custkey, c_nationkey)),
               COUNT(DISTINCT (c_custkey, c_nationkey))
                   - COUNT(DISTINCT c_custkey) = 0
        FROM customer
        UNION ALL
        SELECT 'l_orderkey->l_returnflag',
               COUNT(DISTINCT l_orderkey),
               COUNT(DISTINCT (l_orderkey, l_returnflag)),
               COUNT(DISTINCT (l_orderkey, l_returnflag))
                   - COUNT(DISTINCT l_orderkey) = 0
        FROM lineitem
    """,
)
def rel_fd_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    def probe(df, name, det, dep):
        return df.agg(
            F.countDistinct(det).alias("n_det"),
            F.countDistinct(det, dep).alias("n_pairs"),
        ).select(
            F.lit(name).alias("candidate"),
            "n_det",
            "n_pairs",
            (F.col("n_pairs") - F.col("n_det") == 0).alias("fd_holds"),
        )

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    l = load_table(spark, sf_dir, "lineitem")
    return (
        probe(o, "o_orderkey->o_custkey", "o_orderkey", "o_custkey")
        .unionAll(
            probe(
                o,
                "o_custkey->o_orderpriority",
                "o_custkey",
                "o_orderpriority",
            )
        )
        .unionAll(
            probe(c, "c_custkey->c_nationkey", "c_custkey", "c_nationkey")
        )
        .unionAll(
            probe(l, "l_orderkey->l_returnflag", "l_orderkey", "l_returnflag")
        )
    )


# --------------------------------------------------------------------------
# IQR / Tukey-fence outliers — the robust (non-parametric) counterpart
# to d6_anomaly_zscore's parametric rule: per order priority, fences at
# Q1 - 1.5*IQR and Q3 + 1.5*IQR over order totals, counting rows beyond
# each fence. Exact linear-interpolation quantiles (percentile /
# quantile_cont agree bit-for-bit, 6dp-gridded per rel_agg_percentile's
# policy); the fence comparisons then run in a SECOND conditional
# aggregate joined back by group — two scans total, both partial-agg
# shuffles. Outlier counts are exact integers.
@query(
    "rel_iqr_outliers",
    oracle="""
        WITH fences AS (
            SELECT o_orderpriority,
                   round(quantile_cont(o_totalprice, 0.25), 6) AS q1,
                   round(quantile_cont(o_totalprice, 0.75), 6) AS q3
            FROM orders GROUP BY o_orderpriority
        )
        SELECT o.o_orderpriority, COUNT(*) AS n_rows,
               f.q1, f.q3,
               COUNT(*) FILTER (
                   WHERE o.o_totalprice < f.q1 - 1.5 * (f.q3 - f.q1))
                   AS n_low_outliers,
               COUNT(*) FILTER (
                   WHERE o.o_totalprice > f.q3 + 1.5 * (f.q3 - f.q1))
                   AS n_high_outliers
        FROM orders o JOIN fences f
          ON f.o_orderpriority = o.o_orderpriority
        GROUP BY o.o_orderpriority, f.q1, f.q3
    """,
)
def rel_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    fences = o.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", 0.25), 6).alias("q1"),
        F.round(F.percentile("o_totalprice", 0.75), 6).alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    return (
        o.join(F.broadcast(fences), "o_orderpriority")
        .groupBy("o_orderpriority", "q1", "q3")
        .agg(
            F.count("*").alias("n_rows"),
            F.count_if(
                F.col("o_totalprice") < F.col("q1") - 1.5 * iqr
            ).alias("n_low_outliers"),
            F.count_if(
                F.col("o_totalprice") > F.col("q3") + 1.5 * iqr
            ).alias("n_high_outliers"),
        )
        .select(
            "o_orderpriority", "n_rows", "q1", "q3",
            "n_low_outliers", "n_high_outliers",
        )
    )


# --------------------------------------------------------------------------
# Warehouse health dashboard — the reference's Grafana layer distilled
# to one long-format query: per-table row volumes and key cardinalities,
# referential integrity along the FK chain, and data freshness, emitted
# as (metric, subject, value) rows a panel can pivot. Each table
# contributes one aggregate scan; the two FK probes are anti-joins that
# AQE broadcasts. Query #250 of the registry — the dashboard the other
# 249 queries feed.
@query(
    "rel_warehouse_health",
    oracle="""
        SELECT 'row_count' AS metric, 'customer' AS subject,
               COUNT(*) AS value FROM customer
        UNION ALL
        SELECT 'row_count', 'orders', COUNT(*) FROM orders
        UNION ALL
        SELECT 'row_count', 'lineitem', COUNT(*) FROM lineitem
        UNION ALL
        SELECT 'distinct_keys', 'customer', COUNT(DISTINCT c_custkey)
        FROM customer
        UNION ALL
        SELECT 'distinct_keys', 'orders', COUNT(DISTINCT o_orderkey)
        FROM orders
        UNION ALL
        SELECT 'fk_orphans', 'orders->customer', COUNT(*)
        FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey)
        UNION ALL
        SELECT 'fk_orphans', 'lineitem->orders', COUNT(*)
        FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey)
        UNION ALL
        SELECT 'freshness_epoch_day', 'orders',
               CAST(epoch(MAX(o_orderdate)) // 86400 AS BIGINT)
        FROM orders
    """,
)
def rel_warehouse_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")

    def row(metric, subject, df_agg):
        return df_agg.select(
            F.lit(metric).alias("metric"),
            F.lit(subject).alias("subject"),
            F.col("v").cast("bigint").alias("value"),
        )

    parts = [
        row("row_count", "customer", c.agg(F.count("*").alias("v"))),
        row("row_count", "orders", o.agg(F.count("*").alias("v"))),
        row("row_count", "lineitem", l.agg(F.count("*").alias("v"))),
        row(
            "distinct_keys",
            "customer",
            c.agg(F.countDistinct("c_custkey").alias("v")),
        ),
        row(
            "distinct_keys",
            "orders",
            o.agg(F.countDistinct("o_orderkey").alias("v")),
        ),
        row(
            "fk_orphans",
            "orders->customer",
            o.join(c, o["o_custkey"] == c["c_custkey"], "left_anti").agg(
                F.count("*").alias("v")
            ),
        ),
        row(
            "fk_orphans",
            "lineitem->orders",
            l.join(o, l["l_orderkey"] == o["o_orderkey"], "left_anti").agg(
                F.count("*").alias("v")
            ),
        ),
        row(
            "freshness_epoch_day",
            "orders",
            o.agg(
                F.expr(
                    "unix_seconds(CAST(MAX(o_orderdate) AS TIMESTAMP))"
                    " div 86400"
                ).alias("v")
            ),
        ),
    ]
    out = parts[0]
    for pdf in parts[1:]:
        out = out.unionAll(pdf)
    return out


# --------------------------------------------------------------------------
# REL: hierarchy rollup WITHOUT recursion or iteration — the scale-path
# sibling of rel_hierarchy_rollup's iterated-join walk: subtree
# aggregates over an
# implicit binary org-tree (parent(u) = u >> 1, root 0) on the user-id
# space. The classic warehouse formulation is a recursive CTE (and the
# oracle could use one), but recursion is exactly what a 100 TB engine
# avoids: here each user expands its FULL ancestor path ARITHMETICALLY,
# map-side (<= 41 shifts for a 64-bit id — no joins, no iteration), and
# one hash aggregate on the exploded (ancestor, metrics) pairs produces
# every node's subtree rollup at once. O(n log n) shuffled rows replaces
# O(depth) self-join rounds. Depth itself is the ancestor-list length,
# pure integer arithmetic. The oracle mirrors the same expansion, so the
# cross-engine contract stays exact.
@query(
    "rel_hierarchy_arith_rollup",
    oracle="""
        WITH per_user AS (
            SELECT user_id AS u, COUNT(*) AS n_events,
                   SUM(CAST(value AS DECIMAL(27,6))) AS v
            FROM events GROUP BY user_id
        ),
        listed AS (
            SELECT u, n_events, v,
                   list_distinct([(u >> i)
                       FOR i IN generate_series(0, 40)]) AS ancs
            FROM per_user
        ),
        expanded AS (
            SELECT anc.node AS node, t.u, t.n_events, t.v,
                   len(t.ancs) - 1 AS u_depth
            FROM listed t, unnest(t.ancs) AS anc(node)
        )
        SELECT node,
               CAST(MIN(CASE WHEN node = u THEN u_depth END) AS INT)
                   AS depth,
               CAST(COUNT(*) AS BIGINT) AS n_subtree_users,
               CAST(SUM(n_events) AS BIGINT) AS subtree_events,
               CAST(SUM(v) AS DOUBLE) AS subtree_value
        FROM expanded
        GROUP BY node
    """,
)
def rel_hierarchy_arith_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy(F.col("user_id").alias("u")).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(27,6)")).alias("v"),
    )
    anc = F.expr(
        "array_distinct(transform(sequence(0, 40), i -> shiftright(u, i)))"
    )
    expanded = per_user.select(
        "u",
        "n_events",
        "v",
        (F.size(anc) - 1).alias("u_depth"),
        F.explode(anc).alias("node"),
    )
    return expanded.groupBy("node").agg(
        F.min(F.when(F.col("node") == F.col("u"), F.col("u_depth")))
        .cast("int")
        .alias("depth"),
        F.count("*").alias("n_subtree_users"),
        F.sum("n_events").alias("subtree_events"),
        F.sum("v").cast("double").alias("subtree_value"),
    )


# --------------------------------------------------------------------------
# REL: population stability index — the ML-ops drift metric between the
# early and late halves of the order stream, bucketed on an equi-width
# price grid. The gate a feature store runs before retraining: PSI > 0.2
# means the serving distribution moved. Exactness: the date split uses
# exact percentile_disc; bin ids are floor((p - min)/width) (pure IEEE,
# identical both engines); shares are Laplace-smoothed exact rationals
# ((n+1)/(N+bins), so empty bins need no epsilon hacks); each
# (p-q)*ln(p/q) term is round6-gridded and the total decimal-summed.
# Plan: two broadcast 1-row stats (split date, price range), one hash
# aggregate to the constant 10x2 grid, grid-side math after.
PSI_BINS = 10


@query(
    "rel_psi_drift",
    oracle=f"""
        WITH stats AS (
            SELECT quantile_disc(date_diff('day', DATE '1970-01-01',
                                           o_orderdate), 0.5) AS med,
                   MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi,
                   COUNT(*) AS n
            FROM orders
        ),
        binned AS (
            SELECT CASE WHEN date_diff('day', DATE '1970-01-01',
                                       o.o_orderdate) <= s.med
                        THEN 'early' ELSE 'late' END AS half,
                   LEAST(CAST(floor((o.o_totalprice - s.lo)
                       / ((s.hi - s.lo) / {PSI_BINS})) AS INT),
                       {PSI_BINS - 1}) AS bin
            FROM orders o, stats s
        ),
        cells AS (
            SELECT half, bin, COUNT(*) AS n
            FROM binned GROUP BY half, bin
        ),
        grid AS (
            SELECT h.half, b.bin, COALESCE(c.n, 0) AS n
            FROM (SELECT 'early' AS half UNION ALL SELECT 'late') h
            CROSS JOIN (SELECT unnest(range({PSI_BINS})) AS bin) b
            LEFT JOIN cells c ON c.half = h.half AND c.bin = b.bin
        ),
        tot AS (SELECT half, SUM(n) AS tn FROM grid GROUP BY half),
        shares AS (
            SELECT g.bin,
                   MAX(CASE WHEN g.half = 'early' THEN
                       CAST(g.n + 1 AS DOUBLE) / (t.tn + {PSI_BINS}) END)
                       AS p,
                   MAX(CASE WHEN g.half = 'late' THEN
                       CAST(g.n + 1 AS DOUBLE) / (t.tn + {PSI_BINS}) END)
                       AS q,
                   MAX(CASE WHEN g.half = 'early' THEN g.n END) AS n_early,
                   MAX(CASE WHEN g.half = 'late' THEN g.n END) AS n_late
            FROM grid g JOIN tot t ON t.half = g.half
            GROUP BY g.bin
        ),
        terms AS (
            SELECT bin, CAST(n_early AS BIGINT) AS n_early,
                   CAST(n_late AS BIGINT) AS n_late,
                   ROUND((p - q) * ln(p / q), 6) AS psi_term
            FROM shares
        )
        SELECT CAST(t.bin AS INT) AS bin, t.n_early, t.n_late,
               t.psi_term, tt.total_psi
        FROM terms t,
             (SELECT CAST(SUM(CAST(psi_term AS DECIMAL(27,6))) AS DOUBLE)
                  AS total_psi FROM terms) tt
    """,
)
def rel_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    stats = o.agg(
        F.expr(
            "percentile_disc(0.5) WITHIN GROUP"
            " (ORDER BY datediff(o_orderdate, DATE '1970-01-01'))"
        ).alias("med"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
    )
    binned = o.crossJoin(F.broadcast(stats)).select(
        F.when(
            F.datediff("o_orderdate", F.lit("1970-01-01").cast("date"))
            <= F.col("med"),
            "early",
        )
        .otherwise("late")
        .alias("half"),
        F.least(
            F.floor(
                (F.col("o_totalprice") - F.col("lo"))
                / ((F.col("hi") - F.col("lo")) / F.lit(PSI_BINS))
            ).cast("int"),
            F.lit(PSI_BINS - 1),
        ).alias("bin"),
    )
    cells = binned.groupBy("half", "bin").agg(F.count("*").alias("n"))
    halves = spark.createDataFrame([("early",), ("late",)], "half string")
    bins = spark.range(PSI_BINS).select(F.col("id").cast("int").alias("bin"))
    grid = (
        halves.crossJoin(bins)
        .join(cells, ["half", "bin"], "left")
        .select("half", "bin", F.coalesce("n", F.lit(0)).alias("n"))
    )
    tot = grid.groupBy("half").agg(F.sum("n").alias("tn"))
    g = grid.join(F.broadcast(tot), "half")
    share = (F.col("n") + 1).cast("double") / (F.col("tn") + PSI_BINS)
    shares = g.groupBy("bin").agg(
        F.max(F.when(F.col("half") == "early", share)).alias("p"),
        F.max(F.when(F.col("half") == "late", share)).alias("q"),
        F.max(F.when(F.col("half") == "early", F.col("n"))).alias(
            "n_early"
        ),
        F.max(F.when(F.col("half") == "late", F.col("n"))).alias("n_late"),
    )
    terms = shares.select(
        "bin",
        F.col("n_early").cast("long").alias("n_early"),
        F.col("n_late").cast("long").alias("n_late"),
        F.round(
            (F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q")), 6
        ).alias("psi_term"),
    )
    total = terms.agg(
        F.sum(F.col("psi_term").cast("decimal(27,6)"))
        .cast("double")
        .alias("total_psi")
    )
    return terms.crossJoin(F.broadcast(total))


# --------------------------------------------------------------------------
# ANALYZE-style column statistics — the optimizer-stats collection job
# (`ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS` as a query): per
# column null count, EXACT distinct count, min/max, character volume, and
# the modal value with a deterministic tiebreak (highest count, then
# smallest value). Scale shape: all scalar stats come from ONE scan, and
# ALL modes + the NDV of every mode column come from ONE melt scan
# (explode to (column, value) pairs, count, then per column
# min_by((-count, value)) for the mode and the group count for the exact
# NDV) — never a scan per column, never a global sort. Only l_orderkey
# (no mode, not melted) keeps a COUNT(DISTINCT) in the stats scan, so
# the Expand multiplies rows 2x, not 6x (VERDICT r5 ask #4; at sizes
# where exact NDV is not worth even that, rel_approx_aggs shows the
# sketch path). Reference analog: ClickHouse
# table introspection the reference delegates to the warehouse
# (app/for_clickhouse/from_rabbitmq_to_clickhouse.py:1).
_PROFILE_NUM = (("l_orderkey", False), ("l_quantity", True), ("l_discount", True))
_PROFILE_STR = ("l_returnflag", "l_linestatus")


def _profile_oracle() -> str:
    stat_cols, rows = [], []
    stat_cols.append("COUNT(*) AS n_rows")
    for c, has_mode in _PROFILE_NUM:
        stat_cols += [
            f"COUNT({c}) AS nn_{c}",
            f"COUNT(DISTINCT {c}) AS nd_{c}",
            f"CAST(MIN({c}) AS DOUBLE) AS mn_{c}",
            f"CAST(MAX({c}) AS DOUBLE) AS mx_{c}",
        ]
        top_v = f"CAST(m_{c}.v AS VARCHAR)" if has_mode else "CAST(NULL AS VARCHAR)"
        top_c = f"CAST(m_{c}.c AS BIGINT)" if has_mode else "CAST(NULL AS BIGINT)"
        rows.append(f"""
        SELECT '{c}' AS col_name, CAST(n_rows AS BIGINT) AS n_rows,
               CAST(n_rows - nn_{c} AS BIGINT) AS n_nulls,
               CAST(nd_{c} AS BIGINT) AS n_distinct,
               mn_{c} AS min_num, mx_{c} AS max_num,
               CAST(NULL AS VARCHAR) AS min_str,
               CAST(NULL AS VARCHAR) AS max_str,
               CAST(NULL AS BIGINT) AS n_chars_total,
               {top_v} AS top_value, {top_c} AS top_count
        FROM s{f", m_{c}" if has_mode else ""}""")
    for c in _PROFILE_STR:
        stat_cols += [
            f"COUNT({c}) AS nn_{c}",
            f"COUNT(DISTINCT {c}) AS nd_{c}",
            f"MIN({c}) AS mn_{c}",
            f"MAX({c}) AS mx_{c}",
            f"CAST(SUM(length({c})) AS BIGINT) AS ch_{c}",
        ]
        rows.append(f"""
        SELECT '{c}', CAST(n_rows AS BIGINT), CAST(n_rows - nn_{c} AS BIGINT),
               CAST(nd_{c} AS BIGINT),
               CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
               mn_{c}, mx_{c}, ch_{c},
               CAST(m_{c}.v AS VARCHAR), CAST(m_{c}.c AS BIGINT)
        FROM s, m_{c}""")
    modes = ",\n".join(
        f"""m_{c} AS (
            SELECT {c} AS v, COUNT(*) AS c FROM lineitem
            WHERE {c} IS NOT NULL GROUP BY 1
            ORDER BY c DESC, v ASC LIMIT 1
        )"""
        for c, hm in [*_PROFILE_NUM, *((c, True) for c in _PROFILE_STR)]
        if hm
    )
    return (
        f"WITH s AS (SELECT {', '.join(stat_cols)} FROM lineitem),\n{modes}\n"
        + " UNION ALL ".join(rows)
    )


@query("rel_column_profile", oracle=_profile_oracle())
def rel_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")

    # NDV via Expand ONLY for columns absent from the melt scan
    # (l_orderkey): the 4 mode columns get their exact NDV for free from
    # the melt's (column, value) group-by below (VERDICT r5 ask #4 —
    # trims the multi-distinct Expand's row multiplication from 6x to
    # 2x: one countDistinct lane + the plain-aggregate lane).
    _MELTED = {c for c, hm in _PROFILE_NUM if hm} | set(_PROFILE_STR)
    aggs = [F.count("*").alias("n_rows")]
    for c, _ in _PROFILE_NUM:
        aggs += [
            F.count(c).alias(f"nn_{c}"),
            F.min(c).cast("double").alias(f"mn_{c}"),
            F.max(c).cast("double").alias(f"mx_{c}"),
        ]
        if c not in _MELTED:
            aggs.append(F.countDistinct(c).alias(f"nd_{c}"))
    for c in _PROFILE_STR:
        aggs += [
            F.count(c).alias(f"nn_{c}"),
            F.min(c).alias(f"mn_{c}"),
            F.max(c).alias(f"mx_{c}"),
            F.sum(F.length(c)).cast("long").alias(f"ch_{c}"),
        ]
    base = li.agg(*aggs)

    # ALL modes from ONE melt scan (re-planned round 5: the per-column
    # top-1 loop cost one full lineitem scan per mode column — 5 scans of
    # the fact table total; at 100 TB that is 4 avoidable passes). The
    # melt explodes each row to its 4 (column, value) pairs — the same
    # k-way row multiplication the Expand multi-distinct scan already
    # pays — then one count + one min_by((-count, key, value)) per column
    # gives the identical (highest count, smallest value) tiebreak: the
    # numeric sort key is the double cast (order-preserving for these
    # 2dp decimals), the display value stays the NATIVE string cast, so
    # output strings are byte-identical to the per-column path.
    mode_specs = [(c, True) for c, hm in _PROFILE_NUM if hm] + [
        (c, False) for c in _PROFILE_STR
    ]
    melted = (
        li.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("name"),
                            (
                                F.col(c).cast("double")
                                if is_num
                                else F.lit(None).cast("double")
                            ).alias("k"),
                            F.col(c).cast("string").alias("v"),
                        )
                        for c, is_num in mode_specs
                    ]
                )
            ).alias("m")
        )
        .select("m.*")
        .filter(F.col("v").isNotNull())
    )
    # one group-by per (column, value), then per column: the mode via
    # min_by AND the exact NDV as the group count — distinct raw values
    # map 1:1 to (k, v) pairs (native string cast is injective), so
    # COUNT(*) over the first-stage groups equals COUNT(DISTINCT col)
    tops = (
        melted.groupBy("name", "k", "v")
        .agg(F.count("*").alias("c"))
        .groupBy("name")
        .agg(
            F.min_by(
                F.struct("v", "c"),
                F.struct((-F.col("c")).alias("nc"), "k", "v"),
            ).alias("top"),
            F.count("*").alias("nd"),
        )
    )
    mrow = tops.agg(
        *[
            agg
            for c, _ in mode_specs
            for agg in (
                F.max(
                    F.when(F.col("name") == c, F.col("top.v"))
                ).alias(f"v_{c}"),
                F.max(
                    F.when(F.col("name") == c, F.col("top.c"))
                ).alias(f"c_{c}"),
                F.max(
                    F.when(F.col("name") == c, F.col("nd"))
                ).alias(f"nd_{c}"),
            )
        ]
    )
    base = base.crossJoin(F.broadcast(mrow))

    # Long format WITHOUT a 5-branch union (re-planned round 5): base is
    # ONE row, so each union branch re-derived the whole stats+modes plan
    # — a cold run raced 5 parallel copies of the fact aggregation before
    # any cache could land. Exploding an array of per-column structs
    # keeps a single consumer of the single-row plan: exactly one stats
    # scan + one melt scan, no persist needed.
    null_s = F.lit(None).cast("string")
    null_l = F.lit(None).cast("long")
    null_d = F.lit(None).cast("double")
    rows = []
    for c, has_mode in _PROFILE_NUM:
        rows.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("n_rows").cast("long").alias("n_rows"),
                (F.col("n_rows") - F.col(f"nn_{c}"))
                .cast("long")
                .alias("n_nulls"),
                F.col(f"nd_{c}").cast("long").alias("n_distinct"),
                F.col(f"mn_{c}").alias("min_num"),
                F.col(f"mx_{c}").alias("max_num"),
                null_s.alias("min_str"),
                null_s.alias("max_str"),
                null_l.alias("n_chars_total"),
                (F.col(f"v_{c}") if has_mode else null_s).alias(
                    "top_value"
                ),
                (
                    F.col(f"c_{c}").cast("long") if has_mode else null_l
                ).alias("top_count"),
            )
        )
    for c in _PROFILE_STR:
        rows.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("n_rows").cast("long").alias("n_rows"),
                (F.col("n_rows") - F.col(f"nn_{c}"))
                .cast("long")
                .alias("n_nulls"),
                F.col(f"nd_{c}").cast("long").alias("n_distinct"),
                null_d.alias("min_num"),
                null_d.alias("max_num"),
                F.col(f"mn_{c}").alias("min_str"),
                F.col(f"mx_{c}").alias("max_str"),
                F.col(f"ch_{c}").alias("n_chars_total"),
                F.col(f"v_{c}").alias("top_value"),
                F.col(f"c_{c}").cast("long").alias("top_count"),
            )
        )
    return base.select(F.explode(F.array(*rows)).alias("r")).select("r.*")


# --------------------------------------------------------------------------
# Theil-Sen robust trend — median of all pairwise slopes of each nation's
# monthly revenue series: the estimator that shrugs off the outlier months
# that wreck OLS (b4b_trend_slope is the parametric twin). The O(n^2) pair
# step runs on the BOUNDED month grid (data aggregates to <= months x
# nations rows first), so 100 TB of orders still yields the same ~84-row
# series per key: pair explosion is grid^2, never data^2. Slopes are exact
# IEEE quotients of decimal-routed month sums; the median picks sorted
# positions (n+1)//2 and (n+2)//2 and averages — one or two exact doubles,
# no ROUND anywhere, so the result is bit-identical cross-engine.
@query(
    "rel_theilsen_slope",
    oracle="""
        WITH monthly AS (
            SELECT n.n_name AS nation,
                   CAST(year(o_orderdate) * 12 + month(o_orderdate)
                        AS BIGINT) AS m,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE)
                       AS rev
            FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
                 JOIN nation n ON n.n_nationkey = c.c_nationkey
            GROUP BY 1, 2
        ),
        mcnt AS (
            SELECT nation AS mnation, CAST(COUNT(*) AS BIGINT) AS n_months
            FROM monthly GROUP BY 1
        ),
        pairs AS (
            SELECT a.nation, (b.rev - a.rev) / (b.m - a.m) AS slope
            FROM monthly a
            JOIN monthly b ON b.nation = a.nation AND b.m > a.m
        ),
        ranked AS (
            SELECT nation, slope,
                   ROW_NUMBER() OVER (PARTITION BY nation
                                      ORDER BY slope) AS rn,
                   COUNT(*) OVER (PARTITION BY nation) AS cnt
            FROM pairs
        )
        SELECT nation, n_months, CAST(MAX(cnt) AS BIGINT) AS n_pairs,
               AVG(CASE WHEN rn IN ((cnt + 1) // 2, (cnt + 2) // 2)
                        THEN slope END) AS ts_slope
        FROM ranked JOIN mcnt ON mnation = nation
        GROUP BY nation, n_months
    """,
)
def rel_theilsen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    monthly = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
            .cast("long")
            .alias("m"),
        )
        .agg(dsum("o_totalprice", "rev"))
        .persist()  # grid-sized (nations x months); three consumers below
    )
    mcnt = monthly.groupBy(F.col("nation").alias("mnation")).agg(
        F.count("*").cast("long").alias("n_months")
    )
    a, b = monthly.alias("a"), monthly.alias("b")
    pairs = a.join(
        b,
        (F.col("b.nation") == F.col("a.nation"))
        & (F.col("b.m") > F.col("a.m")),
    ).select(
        F.col("a.nation").alias("nation"),
        (
            (F.col("b.rev") - F.col("a.rev")) / (F.col("b.m") - F.col("a.m"))
        ).alias("slope"),
    )
    wrank = Window.partitionBy("nation").orderBy("slope")
    wcnt = Window.partitionBy("nation")
    ranked = pairs.select(
        "nation",
        "slope",
        F.row_number().over(wrank).alias("rn"),
        F.count("*").over(wcnt).alias("cnt"),
    )
    median_pick = F.when(
        F.col("rn").isin(
            F.expr("(cnt + 1) div 2"), F.expr("(cnt + 2) div 2")
        ),
        F.col("slope"),
    )
    return (
        ranked.join(mcnt, F.col("mnation") == F.col("nation"))
        .groupBy("nation", "n_months")
        .agg(
            F.max("cnt").cast("long").alias("n_pairs"),
            F.avg(median_pick).alias("ts_slope"),
        )
    )


# --------------------------------------------------------------------------
# MAD robust outliers — median absolute deviation, the breakdown-point-0.5
# scale estimate that joins rel_iqr_outliers (Tukey fences) and
# d6_anomaly_zscore (parametric z) to complete the outlier toolbox.
# Inherently two ordered passes (the deviation median depends on the
# location median): each is a per-group exact interpolated percentile
# (Spark `percentile` == DuckDB `quantile_cont` bit-for-bit, 6dp-gridded
# per rel_agg_percentile's policy) followed by a broadcast join of the
# GROUP-sized fence table back onto the scan — never a sort of the data.
# The modified-z flag uses the standard 1.4826 consistency constant
# (|x - med| > 3.5 * 1.4826 * MAD); counts are exact integers.
@query(
    "rel_mad_outliers",
    oracle="""
        WITH med AS (
            SELECT o_orderpriority,
                   round(quantile_cont(o_totalprice, 0.5), 6) AS med
            FROM orders GROUP BY o_orderpriority
        ),
        mad AS (
            SELECT o.o_orderpriority,
                   round(quantile_cont(ABS(o.o_totalprice - m.med), 0.5), 6)
                       AS mad
            FROM orders o JOIN med m
              ON m.o_orderpriority = o.o_orderpriority
            GROUP BY o.o_orderpriority
        )
        SELECT o.o_orderpriority, COUNT(*) AS n_rows, m.med, d.mad,
               COUNT(*) FILTER (
                   WHERE ABS(o.o_totalprice - m.med)
                         > 3.5 * 1.4826 * d.mad) AS n_outliers
        FROM orders o
        JOIN med m ON m.o_orderpriority = o.o_orderpriority
        JOIN mad d ON d.o_orderpriority = o.o_orderpriority
        GROUP BY o.o_orderpriority, m.med, d.mad
    """,
)
def rel_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    med = o.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", 0.5), 6).alias("med")
    )
    mad = (
        o.join(F.broadcast(med), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.round(
                F.percentile(F.abs(F.col("o_totalprice") - F.col("med")), 0.5),
                6,
            ).alias("mad")
        )
    )
    return (
        o.join(F.broadcast(med), "o_orderpriority")
        .join(F.broadcast(mad), "o_orderpriority")
        .groupBy("o_orderpriority", "med", "mad")
        .agg(
            F.count("*").alias("n_rows"),
            F.count_if(
                F.abs(F.col("o_totalprice") - F.col("med"))
                > 3.5 * 1.4826 * F.col("mad")
            ).alias("n_outliers"),
        )
        .select("o_orderpriority", "n_rows", "med", "mad", "n_outliers")
    )


# --------------------------------------------------------------------------
# Join-cardinality estimation audit — the optimizer-statistics exercise
# behind every join reorder Catalyst makes: estimate the l_partkey
# SELF-join output per 64-bucket histogram cell under the textbook
# uniform-frequency assumption (est = (Sum n)^2 / ndv) and compare to the
# EXACT size Sum(n^2), both computed from the per-key count histogram —
# the join itself is never executed (that's the whole point of
# estimation; the exact form is one more aggregate over the same
# histogram). Skew inside a bucket makes the uniform estimate a
# systematic UNDERestimate (Jensen: (Sum n)^2/ndv <= Sum n^2 * ...), the
# bias this audit quantifies per cell in exact integers — why AQE
# re-plans from runtime row counts instead of trusting histograms.
@query(
    "rel_join_size_estimate",
    oracle="""
        WITH keys AS (
            SELECT l_partkey AS k, CAST(COUNT(*) AS BIGINT) AS n
            FROM lineitem GROUP BY 1
        ),
        buckets AS (
            SELECT k % 64 AS b, CAST(SUM(n) AS BIGINT) AS sn,
                   CAST(COUNT(*) AS BIGINT) AS ndv,
                   CAST(SUM(n * n) AS BIGINT) AS actual_rows
            FROM keys GROUP BY 1
        )
        SELECT b, sn, ndv, sn * sn // ndv AS est_rows, actual_rows,
               CAST((2 * (sn * sn // ndv) * 1000000 + actual_rows)
                    // (2 * actual_rows) AS BIGINT) AS est_over_actual_ppm
        FROM buckets
    """,
)
def rel_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    keys = li.groupBy(F.col("l_partkey").alias("k")).agg(
        F.count("*").cast("long").alias("n")
    )
    buckets = keys.groupBy((F.col("k") % 64).alias("b")).agg(
        F.sum("n").cast("long").alias("sn"),
        F.count("*").cast("long").alias("ndv"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("actual_rows"),
    )
    return buckets.select(
        "b",
        "sn",
        "ndv",
        F.expr("sn * sn div ndv").cast("long").alias("est_rows"),
        "actual_rows",
        F.expr(
            "(2 * (sn * sn div ndv) * 1000000 + actual_rows)"
            " div (2 * actual_rows)"
        )
        .cast("long")
        .alias("est_over_actual_ppm"),
    )

# --------------------------------------------------------------------------
# RLE compression audit: how run-length-encodable each column is under
# two candidate physical orderings (insert order vs shipdate-sorted) —
# the measurement behind a layout decision like fmt_zorder_layout's.
# Runs are counted within hash-sized SEGMENTS (orderkey blocks / ship
# months) that are contiguous under the respective global sort, so the
# count is one parallel window pass per ordering — never a global sort
# to a single partition; at 100 TB each segment is a row-group-sized
# unit scanned independently (segment-boundary run merges are ignored
# by construction, documented as <=1 run per segment). Ratio is the
# exact integer 6dp path.
@query(
    "rel_rle_compression_audit",
    oracle="""
        WITH nat AS (
            SELECT CASE WHEN l_returnflag IS DISTINCT FROM
                       LAG(l_returnflag) OVER w THEN 1 ELSE 0 END AS s_rf,
                   CASE WHEN l_linestatus IS DISTINCT FROM
                       LAG(l_linestatus) OVER w THEN 1 ELSE 0 END AS s_ls,
                   CASE WHEN CAST(l_shipdate AS DATE) IS DISTINCT FROM
                       LAG(CAST(l_shipdate AS DATE)) OVER w
                       THEN 1 ELSE 0 END AS s_sd
            FROM lineitem
            WINDOW w AS (PARTITION BY l_orderkey // 4096
                         ORDER BY l_orderkey, l_linenumber,
                                  l_returnflag, l_linestatus,
                                  CAST(l_shipdate AS DATE))
        ),
        srt AS (
            SELECT CASE WHEN l_returnflag IS DISTINCT FROM
                       LAG(l_returnflag) OVER w THEN 1 ELSE 0 END AS s_rf,
                   CASE WHEN l_linestatus IS DISTINCT FROM
                       LAG(l_linestatus) OVER w THEN 1 ELSE 0 END AS s_ls,
                   CASE WHEN CAST(l_shipdate AS DATE) IS DISTINCT FROM
                       LAG(CAST(l_shipdate AS DATE)) OVER w
                       THEN 1 ELSE 0 END AS s_sd
            FROM lineitem
            WINDOW w AS (PARTITION BY date_trunc('month', l_shipdate)
                         ORDER BY CAST(l_shipdate AS DATE), l_orderkey,
                                  l_linenumber, l_returnflag, l_linestatus)
        ),
        agg AS (
            SELECT 'natural' AS ordering,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM(s_rf) AS BIGINT) AS r_rf,
                   CAST(SUM(s_ls) AS BIGINT) AS r_ls,
                   CAST(SUM(s_sd) AS BIGINT) AS r_sd
            FROM nat
            UNION ALL
            SELECT 'shipdate_sorted', CAST(COUNT(*) AS BIGINT),
                   CAST(SUM(s_rf) AS BIGINT), CAST(SUM(s_ls) AS BIGINT),
                   CAST(SUM(s_sd) AS BIGINT)
            FROM srt
        )
        SELECT ordering, column_name, n_rows, n_runs,
               CAST(n_rows * 1000000 // n_runs AS BIGINT) AS rle_ratio_u
        FROM (
            SELECT ordering, 'l_returnflag' AS column_name, n_rows,
                   r_rf AS n_runs FROM agg
            UNION ALL
            SELECT ordering, 'l_linestatus', n_rows, r_ls FROM agg
            UNION ALL
            SELECT ordering, 'l_shipdate', n_rows, r_sd FROM agg
        ) u
    """,
)
def rel_rle_compression_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        "l_linestatus",
        F.col("l_shipdate").cast("date").alias("sd"),
    )

    def run_starts(df: DataFrame, w: Window, ordering: str) -> DataFrame:
        flag = lambda c: (  # noqa: E731
            ~F.col(c).eqNullSafe(F.lag(c).over(w))
        ).cast("long")
        return df.select(
            flag("l_returnflag").alias("s_rf"),
            flag("l_linestatus").alias("s_ls"),
            flag("sd").alias("s_sd"),
        ).agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("s_rf").cast("long").alias("r_rf"),
            F.sum("s_ls").cast("long").alias("r_ls"),
            F.sum("s_sd").cast("long").alias("r_sd"),
        ).select(F.lit(ordering).alias("ordering"), "*")

    # (l_orderkey, l_linenumber) is NOT unique in the fixture; appending
    # the audited columns to the sort key makes tied rows interchangeable,
    # so run counts are deterministic without any unique id.
    w_nat = Window.partitionBy(
        F.expr("l_orderkey div 4096")
    ).orderBy("l_orderkey", "l_linenumber", "l_returnflag",
              "l_linestatus", "sd")
    w_srt = Window.partitionBy(F.date_trunc("month", "sd")).orderBy(
        "sd", "l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus"
    )
    agg = run_starts(li, w_nat, "natural").unionAll(
        run_starts(li, w_srt, "shipdate_sorted")
    )
    cols = [("l_returnflag", "r_rf"), ("l_linestatus", "r_ls"),
            ("l_shipdate", "r_sd")]
    out = None
    for cname, runs in cols:
        part = agg.select(
            "ordering",
            F.lit(cname).alias("column_name"),
            "n_rows",
            F.col(runs).alias("n_runs"),
        )
        out = part if out is None else out.unionAll(part)
    return out.select(
        "ordering",
        "column_name",
        "n_rows",
        "n_runs",
        F.expr("n_rows * 1000000 div n_runs").alias("rle_ratio_u"),
    )

# --------------------------------------------------------------------------
# Wilson score intervals — the binomial-proportion CI shelf next to
# d7_bootstrap_ci (resampling) and d6_ab_power_analysis (design): per
# ship month, the 95% Wilson interval for the returned-line share. The
# Wilson form (score inversion) stays valid at small n and p near 0/1
# where the naive Wald interval collapses — the right default for
# monitoring rare-event rates. One grid-sized groupBy; the CI arithmetic
# is the identical IEEE double expression on both engines (z=1.96
# constants folded: z^2=3.8416, z^2/2=1.9208, z^2/4=0.9604), ROUND-safe
# through sqrt; the point estimate is the exact integer 6dp path.
@query(
    "rel_wilson_ci",
    oracle="""
        WITH g AS (
            SELECT date_trunc('month', l_shipdate) AS m,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(COUNT(*) FILTER (WHERE l_returnflag = 'R')
                        AS BIGINT) AS k
            FROM lineitem GROUP BY 1
        )
        SELECT CAST(m AS DATE) AS month, n, k,
               CAST(k * 1000000 // n AS BIGINT) AS p_u,
               ROUND((CAST(k AS DOUBLE) / n + 1.9208 / n
                      - 1.96 * sqrt((CAST(k AS DOUBLE) / n)
                                    * (1 - CAST(k AS DOUBLE) / n) / n
                                    + 0.9604 / (n * CAST(n AS DOUBLE))))
                     / (1 + 3.8416 / n), 6) AS wilson_lo,
               ROUND((CAST(k AS DOUBLE) / n + 1.9208 / n
                      + 1.96 * sqrt((CAST(k AS DOUBLE) / n)
                                    * (1 - CAST(k AS DOUBLE) / n) / n
                                    + 0.9604 / (n * CAST(n AS DOUBLE))))
                     / (1 + 3.8416 / n), 6) AS wilson_hi
        FROM g
    """,
)
def rel_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    g = li.groupBy(
        F.date_trunc("month", "l_shipdate").alias("m")
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.count_if(F.col("l_returnflag") == "R").cast("long").alias("k"),
    )
    # identical double-op sequence to the oracle (sign is the only
    # difference between the two bounds)
    halfwidth = (
        "1.96 * sqrt((CAST(k AS DOUBLE) / n)"
        " * (1 - CAST(k AS DOUBLE) / n) / n"
        " + 0.9604 / (n * CAST(n AS DOUBLE)))"
    )
    return g.select(
        F.col("m").cast("date").alias("month"),
        "n",
        "k",
        F.expr("k * 1000000 div n").alias("p_u"),
        F.expr(
            f"ROUND((CAST(k AS DOUBLE) / n + 1.9208 / n - {halfwidth})"
            " / (1 + 3.8416 / n), 6)"
        ).alias("wilson_lo"),
        F.expr(
            f"ROUND((CAST(k AS DOUBLE) / n + 1.9208 / n + {halfwidth})"
            " / (1 + 3.8416 / n), 6)"
        ).alias("wilson_hi"),
    )

# --------------------------------------------------------------------------
# Join-strategy equivalence audit — the same customer⋈orders aggregate
# executed under three forced physical strategies (BROADCAST hash,
# sort-MERGE, SHUFFLE_HASH): results must be identical while the plans
# differ (the plan test asserts all three operators actually appear —
# hints that silently no-op are the failure mode this guards). This is
# the regression harness for Spark-version upgrades and the template
# for pinning a strategy when AQE's choice is wrong at 100 TB (e.g.
# forcing SHUFFLE_HASH when the build side fits executor memory but
# exceeds the broadcast threshold; sort-merge's sort dominates).
_JOIN_AUDIT_AGG = """
    SELECT c.c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o.o_totalprice, 6) AS DECIMAL(27,6)))
                AS DOUBLE) AS total_value
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY c.c_mktsegment
"""


@query(
    "rel_join_strategy_audit",
    oracle=f"""
        WITH base AS ({_JOIN_AUDIT_AGG})
        SELECT 'broadcast' AS strategy, * FROM base
        UNION ALL SELECT 'merge', * FROM base
        UNION ALL SELECT 'shuffle_hash', * FROM base
    """,
)
def rel_join_strategy_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")

    def arm(hint: str, label: str) -> DataFrame:
        joined = orders.join(
            customer.hint(hint), orders["o_custkey"] == customer["c_custkey"]
        )
        return joined.groupBy(
            F.col("c_mktsegment").alias("segment")
        ).agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum(F.round("o_totalprice", 6).cast("decimal(27,6)"))
            .cast("double")
            .alias("total_value"),
        ).select(F.lit(label).alias("strategy"), "*")

    return (
        arm("broadcast", "broadcast")
        .unionAll(arm("merge", "merge"))
        .unionAll(arm("shuffle_hash", "shuffle_hash"))
    )

# --------------------------------------------------------------------------
# Temporal referential-integrity audit — FK joins check key EXISTENCE
# (rel_fk_orphan_audit); real warehouses also need the TIME arrow to
# point the right way: a lineitem shipping before its order was placed
# is a pipeline bug (clock skew, backfill misalignment) even though the
# key resolves. One co-partitioned fact-fact join, per-month violation
# shares through the exact integer ppm path — the data-quality monitor
# a 100 TB ingest runs beside the orphan check.
@query(
    "rel_temporal_fk_audit",
    oracle="""
        SELECT CAST(date_trunc('month', o.o_orderdate) AS DATE) AS month,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(COUNT(*) FILTER (WHERE l.l_shipdate < o.o_orderdate)
                    AS BIGINT) AS n_violations,
               CAST(COUNT(*) FILTER (WHERE l.l_shipdate < o.o_orderdate)
                    * 1000000 // COUNT(*) AS BIGINT) AS violation_ppm
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        GROUP BY 1
    """,
)
def rel_temporal_fk_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"])
    viol = F.col("l_shipdate") < F.col("o_orderdate")
    return j.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month")
    ).agg(
        F.count("*").cast("long").alias("n_lines"),
        F.count_if(viol).cast("long").alias("n_violations"),
        F.expr(
            "COUNT(CASE WHEN l_shipdate < o_orderdate THEN 1 END)"
            " * 1000000 div COUNT(*)"
        )
        .cast("long")
        .alias("violation_ppm"),
    )

# --------------------------------------------------------------------------
# Skyline (Pareto frontier) operator — the classic OLAP-literature
# operator Spark has no built-in for: per ship month, the orders no
# other order dominates on (cheaper price, larger quantity). The
# scalable formulation avoids the naive O(n^2) dominance join entirely:
# under the total order (price asc, qty desc, key), a row is in the
# skyline iff its quantity strictly exceeds the running max of
# everything before it — ONE partitioned window pass, parallel across
# months (equal (price, qty) duplicates keep the first key: the
# distinct-value skyline, mirrored exactly in the oracle). Price is
# cent-quantized from identical doubles.
@query(
    "rel_skyline_pareto",
    oracle="""
        WITH o AS (
            SELECT o.o_orderkey,
                   CAST(date_trunc('month', o.o_orderdate) AS DATE) AS m,
                   CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)
                       AS price_c,
                   CAST(SUM(CAST(floor(l.l_quantity + 0.5) AS BIGINT))
                        AS BIGINT) AS qty
            FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            GROUP BY 1, 2, o.o_totalprice
        ),
        sk AS (
            SELECT *, MAX(qty) OVER (PARTITION BY m
                             ORDER BY price_c ASC, qty DESC, o_orderkey ASC
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING) AS best_before
            FROM o
        )
        SELECT m AS month, o_orderkey, price_c, qty
        FROM sk WHERE best_before IS NULL OR qty > best_before
    """,
)
def rel_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    base = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy(
            "o_orderkey",
            F.date_trunc("month", "o_orderdate").cast("date").alias("m"),
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("price_c"),
        )
        .agg(
            F.sum(F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long"))
            .cast("long")
            .alias("qty")
        )
    )
    w = (
        Window.partitionBy("m")
        .orderBy(
            F.col("price_c").asc(), F.col("qty").desc(),
            F.col("o_orderkey").asc(),
        )
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sk = base.withColumn("best_before", F.max("qty").over(w))
    return sk.filter(
        F.col("best_before").isNull() | (F.col("qty") > F.col("best_before"))
    ).select(
        F.col("m").alias("month"), "o_orderkey", "price_c", "qty"
    )
