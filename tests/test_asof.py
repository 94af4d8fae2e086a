"""as_of_join semantics on hand-computed frames: direction, inclusivity,
no-match nulls, multi-key, and the carried matched-timestamp column."""

from __future__ import annotations

import datetime as dt

from bigdatainvesttink_spark.functions import as_of_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:00:05"), 1),
            ("A", _ts("2024-01-01 10:00:10"), 2),
            ("A", _ts("2024-01-01 09:00:00"), 3),  # before any right row
            ("B", _ts("2024-01-01 10:00:10"), 4),  # exact-equal ts on right
        ],
        "k string, ts timestamp_ntz, lid int",
    )
    right = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:00:00"), 100.0),
            ("A", _ts("2024-01-01 10:00:07"), 200.0),
            ("B", _ts("2024-01-01 10:00:10"), 300.0),
            ("B", _ts("2024-01-01 10:00:20"), 400.0),
        ],
        "k string, ts timestamp_ntz, px double",
    )
    return left, right


def test_backward_inclusive(spark):
    left, right = _frames(spark)
    out = {
        r["lid"]: (r["px"], r["mts"])
        for r in as_of_join(
            left, right, on="k", left_ts="ts", right_ts="ts",
            matched_ts_col="mts",
        ).collect()
    }
    assert out[1] == (100.0, _ts("2024-01-01 10:00:00"))  # nearest before
    assert out[2] == (200.0, _ts("2024-01-01 10:00:07"))
    assert out[3] == (None, None)  # nothing at-or-before
    assert out[4] == (300.0, _ts("2024-01-01 10:00:10"))  # equal ts matches


def test_forward_inclusive(spark):
    left, right = _frames(spark)
    out = {
        r["lid"]: r["px"]
        for r in as_of_join(
            left, right, on="k", left_ts="ts", right_ts="ts",
            direction="forward",
        ).collect()
    }
    assert out[1] == 200.0  # nearest at-or-after 10:00:05
    assert out[2] is None  # nothing after 10:00:10 for A
    assert out[3] == 100.0
    assert out[4] == 300.0  # equal ts matches forward too


def test_row_count_preserved(spark):
    left, right = _frames(spark)
    joined = as_of_join(left, right, on="k", left_ts="ts", right_ts="ts")
    assert joined.count() == left.count()
    assert set(joined.columns) == {"k", "ts", "lid", "px"}
