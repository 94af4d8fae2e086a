"""Custom stateful streaming operator (SURVEY.md §2-C5 — "stateful ops are
new capability via state store"): per-instrument running VWAP maintained
with ``applyInPandasWithState``.

The reference's consumer is stateless route-validate-insert; anything
cumulative was delegated to ClickHouse queries. Here the engine itself keeps
per-key state across micro-batches: state = (sum price*volume, sum volume),
output = the updated VWAP per key per batch. State is O(1) per key — the
shape that scales to millions of instruments on a state-store backend
(RocksDB at production scale).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "company_id string, vwap double, total_volume bigint"
STATE_SCHEMA = "sum_pv double, sum_v bigint"


def _update_vwap(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    sum_pv, sum_v = state.get if state.exists else (0.0, 0)
    for pdf in batches:
        sum_pv += float((pdf["price"] * pdf["volume"]).sum())
        sum_v += int(pdf["volume"].sum())
    state.update((sum_pv, sum_v))
    yield pd.DataFrame(
        {
            "company_id": [key[0]],
            "vwap": [sum_pv / sum_v if sum_v else None],
            "total_volume": [sum_v],
        }
    )


def running_vwap(trades_stream: DataFrame) -> DataFrame:
    """trades (company_id, price, volume, ...) -> per-batch updated VWAP."""
    return trades_stream.groupBy("company_id").applyInPandasWithState(
        _update_vwap,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
