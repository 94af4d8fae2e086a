"""Top-k per group — reference goal-implied ranked outputs (SURVEY §2 B8).

A logical pattern over built-ins: rank window + filter. Catalyst plans it as
a single shuffle on the group key followed by an in-partition sort; AQE
handles skewed groups. No custom physical operator needed at 100 TB — the
shuffle is on the grouping key, which is the minimal possible data movement
for an exact per-group top-k.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    rank_col: str = "rnk",
) -> DataFrame:
    """Keep the top-k rows per group under a deterministic total order.

    ``order_cols`` must be a total order (append a unique tiebreaker) so the
    result is oracle-reproducible (ROW_NUMBER OVER (...) <= k in ANSI SQL).
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
