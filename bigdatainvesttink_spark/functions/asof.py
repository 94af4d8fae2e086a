"""As-of (nearest-timestamp) join — required by the reference's analytics
goal №2, "impact of large trades on price"
(app/for_rabbit/from_parser_to_rabbitmq.py:231-232): each trade must be
matched to the nearest candle at-or-before (or at-or-after) its timestamp.

Spark has no built-in ASOF JOIN. This is the union-tag + ``last(...,
ignorenulls)`` running-window formulation: union both inputs on the key,
sort each key-partition by time, and carry the most recent right-side values
forward onto left rows.

Scale analysis (100 TB): exactly ONE shuffle, on the join key — the same
data movement a sort-merge join would need — followed by an in-partition
sort. No broadcast, no cross product, no per-group materialization; window
state is O(1) per key (just the running "last seen" values). Skewed keys are
the only hazard; mitigate upstream by salting the key + post-merging, or
pre-bucketing both sides on the key (then the shuffle disappears entirely).

Oracle parity: DuckDB's native ``ASOF JOIN`` with ``l.ts >= r.ts``
(backward, inclusive) computes the same relation.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TAG = "__asof_tag"  # 0 = right (reference side), 1 = left (probe side)
_TS = "__asof_ts"
_VALS = "__asof_vals"  # carried right-side columns, taken atomically


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str] | None = None,
    direction: str = "backward",
    matched_ts_col: str | None = None,
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts`` <= ``left_ts`` (direction='backward', inclusive) or the
    least ``right_ts`` >= ``left_ts`` ('forward'), per key. Left rows with
    no match keep nulls (left-outer semantics, like DuckDB ASOF LEFT JOIN).

    If several right rows share a (key, right_ts), the window order is
    totalized by the carried value columns themselves (ascending, nulls
    first), so the row with the greatest value tuple wins deterministically
    on any engine and any partitioning — no extra shuffle. The carried
    columns ride the window as ONE struct through a single
    ``last(ignorenulls)``, so a right row is taken or skipped atomically:
    duplicate (key, ts) right rows carrying nulls in some value columns can
    never mix columns from different rows (struct comparison totalizes the
    tie; null fields order before non-null consistently).
    """
    keys = [on] if isinstance(on, str) else list(on)
    value_cols = list(
        right_cols
        if right_cols is not None
        else [c for c in right.columns if c not in (*keys, right_ts)]
    )
    carried = list(value_cols)
    if matched_ts_col:
        carried.append(matched_ts_col)

    left_payload = [c for c in left.columns if c not in (*keys, left_ts)]
    rtypes = dict(right.dtypes)
    ltypes = dict(left.dtypes)

    # All carried right-side columns ride as one struct so the running
    # window takes/skips a right row ATOMICALLY (no per-column mixing under
    # duplicate (key, ts) right rows with nulls inside value columns).
    struct_ddl = "struct<" + ",".join(
        f"`{c}`:{rtypes[right_ts] if (matched_ts_col and c == matched_ts_col) else rtypes[c]}"
        for c in carried
    ) + ">"
    l_side = left.select(
        *keys,
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_TAG),
        *[F.col(c) for c in left_payload],
        F.lit(None).cast(struct_ddl).alias(_VALS),
    )
    r_side = right.select(
        *keys,
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_TAG),
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in left_payload],
        F.struct(
            *[F.col(c).alias(c) for c in value_cols],
            *([F.col(right_ts).alias(matched_ts_col)] if matched_ts_col else []),
        ).alias(_VALS),
    )

    # At equal timestamps the right row must sort before the left row so the
    # inclusive (<= / >=) match is visible to the running window. The value
    # struct then totalizes the order among duplicate right rows (left rows
    # hold a null struct — nulls-first keeps them out of the tiebreak).
    if direction == "backward":
        order = [F.col(_TS).asc(), F.col(_TAG).asc()]
    elif direction == "forward":
        order = [F.col(_TS).desc(), F.col(_TAG).asc()]
    else:
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    order += [F.col(_VALS).asc_nulls_first()]

    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = l_side.unionByName(r_side)
    filled = unioned.select(
        *keys,
        F.col(_TS),
        F.col(_TAG),
        *[F.col(c) for c in left_payload],
        F.last(_VALS, ignorenulls=True).over(w).alias(_VALS),
    )
    return (
        filled.filter(F.col(_TAG) == 1)
        .select(
            *keys,
            F.col(_TS).alias(left_ts),
            *[F.col(c) for c in left_payload],
            *[F.col(f"{_VALS}.`{c}`").alias(c) for c in carried],
        )
    )
