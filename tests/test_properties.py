"""Property-based tests (SURVEY.md §5.2): serialization round-trips, dedup
idempotence, and windowed-vs-whole aggregation consistency over
hypothesis-generated inputs."""

from __future__ import annotations

import datetime as dt
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from bigdatainvesttink_spark.sources.ingest import ingest, serialize

_SETTINGS = dict(
    max_examples=8,  # each example spins Spark jobs; keep the loop tight
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

finite_price = st.floats(
    min_value=0.01, max_value=1e9, allow_nan=False, allow_infinity=False
)
ts_strategy = st.datetimes(
    min_value=dt.datetime(2000, 1, 1), max_value=dt.datetime(2030, 12, 31)
)
company = st.text(alphabet="ABCDEF0123456789", min_size=1, max_size=12)


@given(
    rows=st.lists(
        st.tuples(
            company,
            ts_strategy,
            finite_price,
            st.integers(min_value=0, max_value=2**40),
            st.sampled_from(["buy", "sell"]),
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(**_SETTINGS)
def test_trade_wire_roundtrip_identity(spark, rows):
    """serialize -> dispatch -> validate -> parse must be the identity on
    valid trades, modulo the documented second-precision timestamp truncation."""
    src = spark.createDataFrame(
        [(c, t, p, v, s) for c, t, p, v, s in rows],
        "company_id string, timestamp timestamp_ntz, price double, "
        "volume long, side string",
    )
    out = ingest(serialize(src, "trades", ts_col="timestamp"))["trades"]
    got = sorted(
        (r["company_id"], r["timestamp"], r["price"], r["volume"], r["side"])
        for r in out.collect()
    )
    want = sorted(
        (c, t.replace(microsecond=0), p, v, s) for c, t, p, v, s in rows
    )
    assert [g[:2] + g[3:] for g in got] == [w[:2] + w[3:] for w in want]
    for g, w in zip(got, want):  # float survives the JSON round-trip exactly
        assert math.isclose(g[2], w[2], rel_tol=0, abs_tol=0) or g[2] == w[2]


@given(
    texts=st.lists(
        st.text(alphabet="abcdefg h", min_size=0, max_size=40),
        min_size=1,
        max_size=15,
    )
)
@settings(**_SETTINGS)
def test_exact_dedup_idempotent(spark, texts):
    """Deduplicating an already-deduplicated corpus changes nothing, and
    every canonical id is the min doc_id of its text group."""
    from bigdatainvesttink_spark.functions.text import stable_hash60
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    w = Window.partitionBy(stable_hash60("text"), "text")
    once = df.select(
        "doc_id", "text", F.min("doc_id").over(w).alias("canonical")
    )
    survivors = once.filter(F.col("doc_id") == F.col("canonical")).select(
        "doc_id", "text"
    )
    twice = survivors.select(
        "doc_id", "text", F.min("doc_id").over(w).alias("canonical")
    )
    assert twice.filter(F.col("doc_id") != F.col("canonical")).count() == 0
    by_text: dict[str, int] = {}
    for i, t in enumerate(texts):
        by_text.setdefault(t, i)
    got = {r["text"]: r["doc_id"] for r in survivors.collect()}
    assert got == by_text


@given(
    vals=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.floats(min_value=-1e6, max_value=1e6, allow_nan=False,
                      allow_infinity=False),
        ),
        min_size=1,
        max_size=50,
    )
)
@settings(**_SETTINGS)
def test_grouped_decimal_sums_equal_total(spark, vals):
    """Partitioned (windowed) sums must recompose to the whole-table sum
    exactly — the associativity guarantee the decimal policy rests on."""
    df = spark.createDataFrame(vals, "k int, v double")
    per_group = df.groupBy("k").agg(
        F.sum(F.col("v").cast("decimal(27,6)")).alias("s")
    )
    total_of_groups = per_group.agg(F.sum("s").cast("double")).collect()[0][0]
    total_direct = (
        df.agg(F.sum(F.col("v").cast("decimal(27,6)")).cast("double"))
        .collect()[0][0]
    )
    assert total_of_groups == total_direct
