"""ClickHouse-analog sequence aggregates (d6_sequence_match /
d6_window_funnel): brute-force per-user replicas at sf0.001 plus the
cross-operator implication a 6h-consecutive chain must satisfy inside a
24h window."""

from __future__ import annotations

import __spark_entry__ as entrymod
from bigdatainvesttink_spark.io import load_table
from bigdatainvesttink_spark.operators.events_ops import (
    SEQ_MATCH_GAP_S,
    WINDOW_FUNNEL_W_S,
)
from tests.conftest import SF_SMALL


def _q(name, spark):
    return entrymod.queries()[name](spark, SF_SMALL)


def _user_events(spark):
    """{user_id: [(ts_us, event_id, type), ...]} sorted by (ts, event_id)."""
    from datetime import datetime, timedelta

    rows = (
        load_table(spark, SF_SMALL, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    epoch = datetime(1970, 1, 1)
    by_user: dict[int, list] = {}
    for r in rows:
        us = (r["ts"] - epoch) // timedelta(microseconds=1)
        by_user.setdefault(r["user_id"], []).append(
            (us, r["event_id"], r["event_type"])
        )
    for evs in by_user.values():
        evs.sort()
    return by_user


def _brute_sequence_match(evs, gap_us):
    """Exists view -> click -> purchase with consecutive gaps <= gap_us?
    O(n^2) reference over strict time order (fixture timestamps are unique
    microseconds, so (ts, event_id) order == ts order)."""
    views = [t for t, _, k in evs if k == "view"]
    feasible_clicks = [
        t
        for t, _, k in evs
        if k == "click" and any(v < t and t - v <= gap_us for v in views)
    ]
    return int(
        any(
            k == "purchase"
            and any(c < t and t - c <= gap_us for c in feasible_clicks)
            for t, _, k in evs
        )
    )


def _brute_window_funnel(evs, w_us):
    """Max level where v <= c <= p (strict event order) and p - v <= w_us."""
    level = 0
    n = len(evs)
    for a in range(n):
        if evs[a][2] == "view":
            level = max(level, 1)
            for b in range(a + 1, n):
                if evs[b][2] == "click" and evs[b][0] - evs[a][0] <= w_us:
                    level = max(level, 2)
                    for c in range(b + 1, n):
                        if (
                            evs[c][2] == "purchase"
                            and evs[c][0] - evs[a][0] <= w_us
                        ):
                            return 3
    return level


def test_sequence_match_brute_force(spark):
    got = {
        r["user_id"]: r for r in _q("d6_sequence_match", spark).collect()
    }
    by_user = _user_events(spark)
    assert set(got) == set(by_user)
    gap_us = SEQ_MATCH_GAP_S * 1_000_000
    for uid, evs in by_user.items():
        assert got[uid]["matched"] == _brute_sequence_match(evs, gap_us), uid
        # bookkeeping columns agree with direct counts
        assert got[uid]["n_views"] == sum(1 for e in evs if e[2] == "view")
        if got[uid]["matched"]:
            assert got[uid]["first_match_ts"] is not None
            assert got[uid]["n_feasible_clicks"] >= 1
            assert got[uid]["n_views"] >= 1
        else:
            assert got[uid]["first_match_ts"] is None


def test_window_funnel_brute_force(spark):
    got = {r["user_id"]: r for r in _q("d6_window_funnel", spark).collect()}
    by_user = _user_events(spark)
    assert set(got) == set(by_user)
    w_us = WINDOW_FUNNEL_W_S * 1_000_000
    for uid, evs in by_user.items():
        assert got[uid]["funnel_level"] == _brute_window_funnel(evs, w_us), uid
        lvl = got[uid]["funnel_level"]
        if lvl >= 2:
            assert got[uid]["n_level2_clicks"] >= 1
        if lvl == 3:
            assert got[uid]["n_level3_purchases"] >= 1
        else:
            assert got[uid]["n_level3_purchases"] == 0


def test_sequence_match_implies_funnel_level3(spark):
    """A chain with consecutive gaps <= 6h spans <= 12h total, so every
    sequence-matched user must reach windowFunnel level 3 at W = 24h."""
    assert 2 * SEQ_MATCH_GAP_S <= WINDOW_FUNNEL_W_S
    matched = {
        r["user_id"]
        for r in _q("d6_sequence_match", spark).collect()
        if r["matched"] == 1
    }
    levels = {
        r["user_id"]: r["funnel_level"]
        for r in _q("d6_window_funnel", spark).collect()
    }
    for uid in matched:
        assert levels[uid] == 3, uid
