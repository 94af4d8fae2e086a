"""Query/oracle registry.

Operator modules register (name -> builder, name -> oracle SQL) pairs via
the ``query`` decorator; ``__spark_entry__.py`` re-exports the merged dicts
for the driver. Every builder takes (spark, sf_dir) and returns a DataFrame;
every oracle is a self-contained ANSI SQL statement DuckDB runs over the
pre-registered fixture views.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query builder and (optionally) its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLE[name] = oracle
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _load_operator_modules()
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load_operator_modules()
    return dict(_ORACLE)


_loaded = False


def _load_operator_modules() -> None:
    """Import every module that registers queries (idempotent)."""
    global _loaded
    if _loaded:
        return
    from .operators import (  # noqa: F401
        analytics,
        clustering,
        curation,
        dedup,
        events_ops,
        ingestion,
        multimodal,
        relational,
        relational_ext,
        similarity,
        textops,
        tpch,
        tpch_full,
    )
    from .sources import formats  # noqa: F401
    from .streaming import pipeline  # noqa: F401

    _loaded = True
