"""Skew mitigation: salted two-phase aggregation.

AQE's skew-join splitting (enabled in session.py) covers joins; hot GROUP BY
keys still funnel into single reducers. ``salted_sum_count`` splits each
key's rows across ``n_salts`` sub-keys, pre-aggregates, then combines —
turning one hot reducer into n. Works for any algebraic aggregate; sum/count
(and avg = sum/count) are provided since they cover the engine's hot paths.

The salt is ``monotonically_increasing_id() % n`` — deterministic within a
run, uniform across partitions, and independent of the data (a data-derived
hash would keep all copies of a hot VALUE on one salt, defeating the point
when the skew is a single repeated row).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    keys: Sequence[str],
    sum_cols: dict[str, Column | str],
    n_salts: int = 16,
    count_alias: str = "n_rows",
) -> DataFrame:
    """GROUP BY ``keys`` computing decimal-exact sums + a row count, with a
    salt-split first phase. Result is identical to the direct aggregation
    (decimal addition is associative), so the two plans are interchangeable
    — pick this one when a key is hot."""
    salt = (F.monotonically_increasing_id() % n_salts).alias("__salt")
    partial = (
        df.select(
            *keys,
            salt,
            *[
                (F.col(c) if isinstance(c, str) else c).alias(f"__v_{alias}")
                for alias, c in sum_cols.items()
            ],
        )
        .groupBy(*keys, "__salt")
        .agg(
            *[
                F.sum(F.col(f"__v_{alias}").cast("decimal(27,6)")).alias(
                    f"__s_{alias}"
                )
                for alias in sum_cols
            ],
            F.count("*").alias("__c"),
        )
    )
    return partial.groupBy(*keys).agg(
        *[
            F.sum(f"__s_{alias}").cast("double").alias(alias)
            for alias in sum_cols
        ],
        F.sum("__c").alias(count_alias),
    )
