"""Physical-plan audit helpers: the scale contract, machine-checked.

Correctness says what a query returns; these helpers pin down HOW Spark
executes it — filter/column pushdown into the parquet scan, broadcast vs
shuffle join strategy, partition pruning, top-k via TakeOrderedAndProject,
shuffle counts. tests/test_plans.py asserts the properties that must
survive a 100x scale-up; a regression here is a performance bug even when
every value still matches the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_text(df: DataFrame) -> str:
    """Full query-execution dump (logical + physical, incl. scan details)."""
    return df._jdf.queryExecution().toString()


def executed_plan(df: DataFrame) -> str:
    """Final physical plan (post-AQE if already executed)."""
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters section(s) of the parquet scans."""
    text = plan_text(df)
    return "\n".join(
        line.strip() for line in text.splitlines() if "PushedFilters" in line
    )


def read_schemas(df: DataFrame) -> str:
    text = plan_text(df)
    return "\n".join(
        line.strip() for line in text.splitlines() if "ReadSchema" in line
    )


def count_occurrences(df: DataFrame, token: str) -> int:
    return plan_text(df).count(token)


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in plan_text(df)


def shuffle_count(df: DataFrame) -> int:
    """Number of exchange (shuffle) operators in the physical plan."""
    text = plan_text(df)
    physical = text.split("== Physical Plan ==")[-1]
    return sum(
        line.count("Exchange hashpartitioning")
        + line.count("Exchange rangepartitioning")
        for line in physical.splitlines()
        if "BroadcastExchange" not in line
    )
