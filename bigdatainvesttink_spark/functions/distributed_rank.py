"""Distributed global row numbering (two-phase rank).

``row_number().over(Window.orderBy(...))`` with no partitionBy plans as
Exchange SinglePartition + one task sorting the ENTIRE input — correct,
but fatal on data-sized inputs at cluster scale (VERDICT r4 "What's
wrong" #1). This helper computes the exact same global rank
distributedly, the way ``RDD.zipWithIndex`` does:

  1. range-repartition on the rank key, so partition p holds a
     contiguous ordered slice (every row in partition < p sorts strictly
     before every row in partition p);
  2. ``row_number`` WITHIN each partition — parallel sorts;
  3. collect the per-partition row counts (<= num_partitions rows — the
     one driver-side step, same as zipWithIndex) and turn cumulative
     offsets into a literal map: global rank = local rank + offset(pid).

The result is bit-identical to the single-sort rank for any total
ordering (give explicit tiebreak columns, per the repo's exactness
discipline).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def with_global_row_number(
    df: DataFrame,
    order_cols: list[Column],
    out: str = "rnk",
    num_partitions: int = 32,
    counts_out: list | None = None,
) -> DataFrame:
    """Append a 1-based global row number following ``order_cols``.

    ``order_cols`` must be a total order (add id tiebreaks) — ties across
    a range-partition boundary would otherwise make ranks nondeterministic.
    The returned frame keeps all input columns; the extra ``pid``/local
    columns are dropped. Pass a list as ``counts_out`` to receive the
    total row count (appended as its single element) — it falls out of
    the partition-count collect for free, saving callers a second
    counting pass over ``df``.
    """
    local_w = Window.partitionBy("__pid").orderBy(*order_cols)
    local = (
        df.repartitionByRange(num_partitions, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .withColumn("__li", F.row_number().over(local_w).cast("long"))
    )
    pcs = {
        r["__pid"]: r["pc"]
        for r in local.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("pc"))
        .collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(pcs):
        offsets[pid] = acc
        acc += pcs[pid]
    if counts_out is not None:
        counts_out.append(acc)
    if offsets:
        off = F.coalesce(
            F.create_map(
                *[F.lit(x) for kv in offsets.items() for x in kv]
            )[F.col("__pid")],
            F.lit(0),
        ).cast("long")
    else:
        off = F.lit(0).cast("long")
    return local.withColumn(out, F.col("__li") + off).drop(
        "__pid", "__li"
    )
