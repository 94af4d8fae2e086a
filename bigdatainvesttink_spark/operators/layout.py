"""Physical data-layout operators: bucketed co-located joins, z-order
(Morton) clustering with data-skipping statistics, and interval-bin joins.

These are the storage-layout levers a 100 TB deployment pulls to make the
per-query plans in the rest of the engine cheap:

  * BUCKETING pre-partitions both sides of a recurring equi-join on the
    join key at write time, so the join itself needs NO exchange — the
    shuffle is paid once at ingest, then amortized over every query.
  * Z-ORDERING interleaves the bits of two filter dimensions into one sort
    key, so range predicates on EITHER dimension prune most files via
    min/max statistics (the layout trick behind Delta OPTIMIZE ZORDER /
    ClickHouse skip indexes — here derived from first principles).
  * INTERVAL BINNING turns a containment join (point BETWEEN lo AND hi) —
    which Spark would otherwise plan as a broadcast-nested-loop or
    cartesian — into an equi-join on a coarse bin, with the range predicate
    as a cheap residual. Bounded fan-out: an interval spans at most
    ceil(max_len/bin)+1 bins.

The reference delegates all storage layout to ClickHouse's MergeTree
ORDER BY key (reference docker-compose ClickHouse service,
/root/reference/compose.yaml); these operators are the Spark-native
equivalents, oracle-checked on values and plan-checked on shape.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import query
from ..session import scratch_dir

# --------------------------------------------------------------------------
# Z-order (Morton) interleave of two 16-bit dimensions, generated once as
# SQL text for BOTH engines so the formula cannot drift. Spark spells bit
# ops shiftright/shiftleft/&; DuckDB spells them >> << &.

_Z_BITS = 16


def _zkey_spark(a: str, b: str) -> str:
    terms = []
    for j in range(_Z_BITS):
        terms.append(
            f"shiftleft(CAST(shiftright({a}, {j}) & 1 AS BIGINT), {2 * j})"
        )
        terms.append(
            f"shiftleft(CAST(shiftright({b}, {j}) & 1 AS BIGINT), {2 * j + 1})"
        )
    return " + ".join(terms)


def _zkey_duck(a: str, b: str) -> str:
    terms = []
    for j in range(_Z_BITS):
        terms.append(f"((({a} >> {j}) & 1) << {2 * j})")
        terms.append(f"((({b} >> {j}) & 1) << {2 * j + 1})")
    return " + ".join(terms)


# The two clustering dimensions: customer key and days-since-epoch-start of
# the order date, both masked to 16 bits. (At 100 TB the dims would be
# quantile-binned first so each contributes uniformly; the interleave and
# the skipping stats are identical.)
_DIM_A_SPARK = "(o_custkey & 65535)"
_DIM_A_DUCK = "(o_custkey & 65535)"
_DIM_B_SPARK = "(datediff(o_orderdate, DATE '1992-01-01') & 65535)"
_DIM_B_DUCK = "(date_diff('day', DATE '1992-01-01', o_orderdate) & 65535)"


@query(
    "fmt_zorder_layout",
    oracle=f"""
        WITH z AS (
            SELECT {_DIM_A_DUCK} AS dim_cust,
                   {_DIM_B_DUCK} AS dim_day,
                   ({_zkey_duck(_DIM_A_DUCK, _DIM_B_DUCK)}) AS zkey
            FROM orders
        )
        SELECT CAST(zkey >> 26 AS BIGINT) AS file_id,
               COUNT(*) AS n_rows,
               MIN(dim_cust) AS min_cust, MAX(dim_cust) AS max_cust,
               MIN(dim_day) AS min_day, MAX(dim_day) AS max_day
        FROM z GROUP BY 1
    """,
)
def fmt_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering of orders on (custkey, orderdate) + the per-file
    min/max skipping statistics that layout buys.

    Each output row is one logical file (top 6 bits of the 32-bit Morton
    key = 64 range-partitioned files, the deterministic stand-in for
    ``repartitionByRange(zkey)`` + per-file writes). The min/max columns
    ARE the data-skipping index: because the Morton key interleaves bits,
    every file covers a narrow rectangle in (custkey, orderdate) space, so
    a range filter on EITHER dimension eliminates most files — unlike a
    plain sort on custkey, where a date filter prunes nothing.
    """
    o = load_table(spark, sf_dir, "orders")
    z = o.select(
        F.expr(_DIM_A_SPARK).alias("dim_cust"),
        F.expr(_DIM_B_SPARK).alias("dim_day"),
        F.expr(_zkey_spark(_DIM_A_SPARK, _DIM_B_SPARK)).alias("zkey"),
    )
    return (
        z.groupBy(
            F.expr("CAST(shiftright(zkey, 26) AS BIGINT)").alias("file_id")
        )
        .agg(
            F.count("*").alias("n_rows"),
            F.min("dim_cust").alias("min_cust"),
            F.max("dim_cust").alias("max_cust"),
            F.min("dim_day").alias("min_day"),
            F.max("dim_day").alias("max_day"),
        )
    )


# --------------------------------------------------------------------------
# Bucketed co-located join: orders and customer written bucketed by the
# join key (8 buckets, sorted within buckets), then joined WITHOUT any
# exchange — the scan's bucket layout satisfies the join's distribution
# requirement. The merge hint pins sort-merge so the demonstration is of
# bucket co-location, not of AQE broadcasting a small side; the plan test
# asserts there is no exchange on the join key.


def _bucket_table_name(base: str, sf_dir: str) -> str:
    tag = re.sub(r"[^A-Za-z0-9_]", "_", sf_dir.rstrip("/").rsplit("/", 1)[-1])
    return f"bkt_{base}_{tag}"


@query(
    "fmt_bucketed_join_no_shuffle",
    oracle="""
        SELECT c.c_mktsegment,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(27,6))) AS DOUBLE)
                   AS revenue
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
    """,
)
def fmt_bucketed_join_no_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join two bucketed tables with zero join-side shuffle.

    Both tables are written ``bucketBy(8, <join key>)`` into the session
    warehouse (the once-per-ingest cost); the subsequent join reads the
    bucket layout as its partitioning, so the ONLY exchange in the plan is
    the final per-segment rollup. At 100 TB this converts every recurring
    orders-by-customer query from two full shuffles into zero.
    """
    ot, ct = (
        _bucket_table_name("orders", sf_dir),
        _bucket_table_name("customer", sf_dir),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    # External tables at a fresh temp path: the catalog entry is per-JVM
    # while spark-warehouse/ persists, so a managed table from an earlier
    # session would collide on location (LOCATION_ALREADY_EXISTS).
    tmp = scratch_dir("bkt_")
    spark.sql(f"DROP TABLE IF EXISTS {ot}")
    spark.sql(f"DROP TABLE IF EXISTS {ct}")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .option("path", f"{tmp}/orders")
        .saveAsTable(ot)
    )
    (
        customer.write.mode("overwrite")
        .bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .option("path", f"{tmp}/customer")
        .saveAsTable(ct)
    )
    j = spark.table(ot).hint("merge").join(
        spark.table(ct), F.col("o_custkey") == F.col("c_custkey")
    )
    return j.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(27,6)"))
        .cast("double")
        .alias("revenue"),
    )


# --------------------------------------------------------------------------
# Interval-overlap join via bin equi-keys: each lineitem carries a derived
# validity interval [l_shipdate, l_shipdate + 1..28 days] (the fixture has
# no receiptdate; the width is a deterministic function of the row). A
# probe set of dates must count the intervals covering each date. Naive
# Spark planning of `d BETWEEN lo AND hi` with no equi-key is a nested
# loop over the full fact table; binning the time axis (32-day bins >= max
# interval width) makes it an equi-join on the bin with BETWEEN as a
# residual filter, and each interval lands in at most 2 bins.

_WIDTH_SPARK = "CAST((l_orderkey * 7 + l_linenumber) % 28 + 1 AS INT)"
_WIDTH_DUCK = "CAST((l_orderkey * 7 + l_linenumber) % 28 + 1 AS INT)"
_BIN_DAYS = 32


@query(
    "rel_interval_bin_join",
    oracle=f"""
        WITH iv AS (
            SELECT l_shipdate AS lo,
                   l_shipdate + INTERVAL ({_WIDTH_DUCK}) DAY AS hi,
                   l_quantity
            FROM lineitem
        ),
        pts AS (
            SELECT DISTINCT o_orderdate AS d FROM orders
            WHERE o_orderkey % 97 = 0
        )
        SELECT p.d AS probe_date,
               COUNT(*) AS n_covering,
               CAST(SUM(CAST(iv.l_quantity AS DECIMAL(27,6))) AS DOUBLE)
                   AS qty_covered
        FROM pts p JOIN iv
          ON p.d >= iv.lo AND p.d <= CAST(iv.hi AS DATE)
        GROUP BY p.d
    """,
)
def rel_interval_bin_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    iv = li.select(
        F.col("l_shipdate").alias("lo"),
        F.expr(f"date_add(l_shipdate, {_WIDTH_SPARK})").alias("hi"),
        "l_quantity",
    )
    # Explode each interval over the (at most 2) bins it touches; the bin
    # is epoch-day // 32, wider than any interval, so fan-out is bounded.
    binned = iv.select(
        "lo",
        "hi",
        "l_quantity",
        F.explode(
            F.sequence(
                F.expr(f"CAST(datediff(lo, DATE '1970-01-01') AS BIGINT) div {_BIN_DAYS}"),
                F.expr(f"CAST(datediff(hi, DATE '1970-01-01') AS BIGINT) div {_BIN_DAYS}"),
            )
        ).alias("bin"),
    )
    pts = (
        load_table(spark, sf_dir, "orders")
        .filter(F.expr("o_orderkey % 97 = 0"))
        .select(F.col("o_orderdate").alias("d"))
        .distinct()
        .withColumn(
            "bin",
            F.expr(f"CAST(datediff(d, DATE '1970-01-01') AS BIGINT) div {_BIN_DAYS}"),
        )
    )
    j = pts.join(binned, "bin").filter(
        (F.col("d") >= F.col("lo")) & (F.col("d") <= F.col("hi"))
    )
    return j.groupBy(F.col("d").alias("probe_date")).agg(
        F.count("*").alias("n_covering"),
        F.sum(F.col("l_quantity").cast("decimal(27,6)"))
        .cast("double")
        .alias("qty_covered"),
    )


# --------------------------------------------------------------------------
# Small-file compaction — the lakehouse maintenance job every streaming
# ingest needs: micro-batch appends leave thousands of KB-sized files whose
# per-file open/footer cost eventually dominates scans; compaction
# rewrites them into few right-sized files WITHOUT changing the data. The
# query performs the rewrite (32 shards -> 4) and proves identity by
# emitting the table's per-priority reconciliation checksums from the
# COMPACTED copy — the oracle computes them from the logical table, so any
# row lost, duplicated, or mutated by the rewrite breaks the hash match.
# File counts are pinned by explicit repartition on both writes (the write
# path is deterministic, so they are assertable cross-engine as literals).
@query(
    "fmt_compact_small_files",
    oracle="""
        SELECT 32 AS files_before, 4 AS files_after,
               o_orderpriority, COUNT(*) AS n_rows,
               bit_xor(CAST(CAST('0x' || substr(md5(concat_ws('|',
                   o_orderkey, o_custkey, o_orderstatus)), 1, 15)
                   AS UBIGINT) AS BIGINT)) AS checksum
        FROM orders
        GROUP BY o_orderpriority
    """,
)
def fmt_compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob as _glob

    from ..functions.text import stable_hash60

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"
    )
    tmp = scratch_dir("compact_")
    # the fragmented state a micro-batch ingest leaves behind
    o.repartition(32).write.mode("overwrite").parquet(f"{tmp}/small")
    frag = spark.read.parquet(f"{tmp}/small")
    files_before = len(_glob.glob(f"{tmp}/small/part-*"))
    # the maintenance rewrite: few large files, data untouched
    frag.repartition(4).write.mode("overwrite").parquet(f"{tmp}/compacted")
    files_after = len(_glob.glob(f"{tmp}/compacted/part-*"))
    compacted = spark.read.parquet(f"{tmp}/compacted")
    digest = stable_hash60(
        F.concat_ws("|", "o_orderkey", "o_custkey", "o_orderstatus")
    )
    return compacted.groupBy("o_orderpriority").agg(
        F.lit(files_before).alias("files_before"),
        F.lit(files_after).alias("files_after"),
        F.count("*").alias("n_rows"),
        F.bit_xor(digest).alias("checksum"),
    ).select(
        "files_before", "files_after", "o_orderpriority", "n_rows", "checksum"
    )


# --------------------------------------------------------------------------
# Dynamic partition overwrite — the partition-level upsert every batch
# warehouse job relies on (INSERT OVERWRITE ... PARTITION semantics, the
# recompute-one-day pattern): with partitionOverwriteMode=dynamic, an
# overwrite write replaces ONLY the partitions present in the incoming
# frame and leaves every other partition's files untouched. The drill
# seeds a 5-partition events table, then overwrites just the click/view
# partitions with a recomputed (even-event_id) slice; per-partition row
# counts AND content checksums of the final table must match the logical
# expectation — a static-mode overwrite (which would have dropped the
# other three partitions) or a partition leak breaks the hash. The conf
# override is scoped and restored, same discipline as run_to_memory's
# shuffle-partition override.
@query(
    "fmt_partition_overwrite_dynamic",
    oracle="""
        SELECT event_type, COUNT(*) AS n_events,
               bit_xor(CAST(CAST('0x' || substr(md5(concat_ws('|',
                   event_id, user_id)), 1, 15)
                   AS UBIGINT) AS BIGINT)) AS checksum
        FROM events
        WHERE event_type NOT IN ('click', 'view') OR event_id % 2 = 0
        GROUP BY event_type
    """,
)
def fmt_partition_overwrite_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import stable_hash60

    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    tmp = scratch_dir("dynover_")
    e.write.partitionBy("event_type").mode("overwrite").parquet(f"{tmp}/t")
    updates = e.filter(
        F.col("event_type").isin("click", "view") & (F.col("event_id") % 2 == 0)
    )
    conf_key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(conf_key)
    try:
        spark.conf.set(conf_key, "dynamic")
        updates.write.partitionBy("event_type").mode("overwrite").parquet(
            f"{tmp}/t"
        )
    finally:
        spark.conf.set(conf_key, prev)
    final = spark.read.parquet(f"{tmp}/t")
    digest = stable_hash60(F.concat_ws("|", "event_id", "user_id"))
    return final.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.bit_xor(digest).alias("checksum"),
    )


# --------------------------------------------------------------------------
# Row-group size planner — the writer-tuning audit: estimate bytes/row
# per table from column physics (8B fixed-width numerics/timestamps, 4B
# ints, actual string lengths), then derive rows-per-128MiB-row-group
# and the group count. This is the number you set
# spark.sql.files.maxPartitionBytes / parquet.block.size against when a
# 100 TB write must produce scan-efficient files; too-small groups kill
# min/max pruning (fmt_zorder_layout), too-large ones kill parallelism.
# One narrow aggregate per table, all-integer arithmetic end to end.
_ROWGROUP_TARGET = 134_217_728  # 128 MiB

# (table, fixed_bytes_per_row, varchar columns)
_TABLE_PHYSICS = (
    ("lineitem", 68, ("l_returnflag", "l_linestatus")),
    ("orders", 32, ("o_orderstatus", "o_orderpriority")),
    ("events", 32, ("event_type", "props")),
)


def _rowgroup_oracle() -> str:
    parts = []
    for t, fixed, varchars in _TABLE_PHYSICS:
        lens = " + ".join(f"SUM(length({c}))" for c in varchars)
        parts.append(f"""
            SELECT '{t}' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(COUNT(*) * {fixed} + {lens} AS BIGINT) AS est_bytes
            FROM {t}""")
    union = "\n            UNION ALL".join(parts)
    return f"""
        WITH sizes AS ({union}
        )
        SELECT table_name, n_rows, est_bytes,
               CAST(est_bytes * 1000000 // n_rows AS BIGINT)
                   AS bytes_per_row_u,
               CAST({_ROWGROUP_TARGET} * n_rows // est_bytes AS BIGINT)
                   AS rows_per_group,
               CAST((est_bytes + {_ROWGROUP_TARGET} - 1)
                    // {_ROWGROUP_TARGET} AS BIGINT) AS n_groups
        FROM sizes
    """


@query("fmt_rowgroup_planner", oracle=_rowgroup_oracle())
def fmt_rowgroup_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for t, fixed, varchars in _TABLE_PHYSICS:
        df = load_table(spark, sf_dir, t)
        lens = None
        for c in varchars:
            term = F.sum(F.length(c)).cast("long")
            lens = term if lens is None else lens + term
        part = df.agg(
            F.count("*").cast("long").alias("n_rows"),
            (F.count("*") * fixed + lens).cast("long").alias("est_bytes"),
        ).select(F.lit(t).alias("table_name"), "n_rows", "est_bytes")
        out = part if out is None else out.unionAll(part)
    tgt = _ROWGROUP_TARGET
    return out.select(
        "table_name",
        "n_rows",
        "est_bytes",
        F.expr("est_bytes * 1000000 div n_rows").alias("bytes_per_row_u"),
        F.expr(f"{tgt} * n_rows div est_bytes").alias("rows_per_group"),
        F.expr(f"(est_bytes + {tgt} - 1) div {tgt}").alias("n_groups"),
    )
