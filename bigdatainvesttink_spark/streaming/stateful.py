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

import math
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


# --------------------------------------------------------------------------
# Streaming point-in-time features — the stateful twin of the batch
# d6_pit_features (operators/events_ops.py): per-user custom state carries
# the event history; every micro-batch folds its rows in and re-emits the
# feature vector of each purchase seen so far, stamped with a monotone
# `n_seen` counter so the LAST emission per purchase (the one that has
# seen every event) is the final answer under ANY micro-batch split or
# arrival order — the same last-write-wins readout as the VWAP query.
# State here keeps the full per-user history because the harness replays a
# bounded fixture; the production variant registers an event-time timeout
# and evicts rows older than (watermark - 7d horizon) on each timeout
# tick, bounding state to one feature horizon per user exactly like
# dropDuplicatesWithinWatermark bounds its key store. Feature arithmetic
# matches the batch/oracle form bit-for-bit: counts are ints, monetary
# sums go through exact micro-integer accumulation (== the oracle's
# DECIMAL(27,6) sum cast to DOUBLE), and "before" is strict tus
# comparison (value ties excluded on both engines).
PIT_OUTPUT_SCHEMA = (
    "event_id bigint, user_id bigint, label_tus bigint, "
    "label_value double, n_views_24h bigint, n_clicks_24h bigint, "
    "click_value_7d double, days_since_signup bigint, n_seen bigint"
)
PIT_STATE_SCHEMA = (
    "tus array<bigint>, eid array<bigint>, etype array<string>, "
    "val array<bigint>"
)

_DAY_US = 86_400_000_000


def _update_pit(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        s_tus, s_eid, s_etype, s_val = state.get
        tus, eid, etype, val = list(s_tus), list(s_eid), list(s_etype), list(s_val)
    else:
        tus, eid, etype, val = [], [], [], []
    for pdf in batches:
        for r_tus, r_eid, r_type, r_val in zip(
            pdf["tus"], pdf["event_id"], pdf["event_type"], pdf["value"]
        ):
            tus.append(int(r_tus))
            eid.append(int(r_eid))
            etype.append(str(r_type))
            # half-UP micro quantization (math.floor(x*1e6 + 0.5)), matching
            # the batch/oracle DECIMAL(27,6) discipline — Python round() is
            # half-to-even and would diverge on exact .5 micro boundaries
            val.append(int(math.floor(float(r_val) * 1_000_000 + 0.5)))
    state.update((tus, eid, etype, val))

    rows = sorted(zip(tus, eid, etype, val))
    n_seen = len(rows)
    out: dict[str, list] = {k: [] for k in (
        "event_id", "user_id", "label_tus", "label_value", "n_views_24h",
        "n_clicks_24h", "click_value_7d", "days_since_signup", "n_seen",
    )}
    for t, i, k, v in rows:
        if k != "purchase":
            continue
        prior = [x for x in rows if x[0] < t]
        views = sum(1 for x in prior if x[2] == "view" and t - x[0] <= _DAY_US)
        clicks = sum(
            1 for x in prior if x[2] == "click" and t - x[0] <= _DAY_US
        )
        cv7_u = sum(
            x[3] for x in prior if x[2] == "click" and t - x[0] <= 7 * _DAY_US
        )
        signups = [x[0] for x in prior if x[2] == "signup"]
        out["event_id"].append(i)
        out["user_id"].append(int(key[0]))
        out["label_tus"].append(t)
        out["label_value"].append(v / 1_000_000)
        out["n_views_24h"].append(views)
        out["n_clicks_24h"].append(clicks)
        out["click_value_7d"].append(cv7_u / 1_000_000)
        out["days_since_signup"].append(
            (t - max(signups)) // _DAY_US if signups else None
        )
        out["n_seen"].append(n_seen)
    if out["event_id"]:
        yield pd.DataFrame(out)


def streaming_pit_features(events_stream: DataFrame) -> DataFrame:
    """events (user_id, event_id, tus, event_type, value) -> per-batch
    re-emitted point-in-time purchase features; take the max-n_seen row
    per event_id as the final answer."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update_pit,
        outputStructType=PIT_OUTPUT_SCHEMA,
        stateStructType=PIT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
