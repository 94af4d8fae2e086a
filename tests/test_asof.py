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


def test_duplicate_right_ts_with_nulls_is_atomic(spark):
    # Duplicate (key, ts) right rows carrying nulls in different value
    # columns: the winner must be ONE row (the greatest value tuple), never
    # a per-column mix of several rows — and the result must not depend on
    # input order or partitioning.
    left = spark.createDataFrame(
        [("A", _ts("2024-01-01 10:00:05"), 1)],
        "k string, ts timestamp_ntz, lid int",
    )
    dup_rows = [
        ("A", _ts("2024-01-01 10:00:00"), None, 10.0),
        ("A", _ts("2024-01-01 10:00:00"), 5.0, None),
        ("A", _ts("2024-01-01 10:00:00"), 5.0, 7.0),
    ]
    schema = "k string, ts timestamp_ntz, px double, qty double"
    expected = (5.0, 7.0)  # greatest (px, qty) tuple, taken atomically
    for rows in (dup_rows, dup_rows[::-1], dup_rows[1:] + dup_rows[:1]):
        for nparts in (1, 3):
            right = spark.createDataFrame(rows, schema).repartition(nparts)
            out = as_of_join(
                left, right, on="k", left_ts="ts", right_ts="ts"
            ).collect()[0]
            assert (out["px"], out["qty"]) == expected, (rows, nparts)
