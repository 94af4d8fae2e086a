"""Warehouse-ops invariants the DuckDB oracle cannot express: checksum
mutation sensitivity, funnel ordering, gap-fill span coverage, and complete
PII scrubbing."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from tests.conftest import SF_SMALL


def _q(name, spark, sf_dir=SF_SMALL):
    return entrymod.queries()[name](spark, sf_dir)


def test_checksum_detects_single_row_mutation(spark, tmp_path):
    """Flipping one value in one row must change exactly that group's
    checksum and leave every other group's checksum untouched."""
    base = tmp_path / "base"
    base.mkdir()
    shutil.copy(f"{SF_SMALL}/orders.parquet", base / "orders.parquet")

    mut = tmp_path / "mut"
    mut.mkdir()
    o = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    first = o.orderBy("o_orderkey").first()
    mutated = o.withColumn(
        "o_custkey",
        F.when(
            F.col("o_orderkey") == first["o_orderkey"],
            F.col("o_custkey") + 1,
        ).otherwise(F.col("o_custkey")),
    )
    mutated.coalesce(1).write.parquet(str(mut / "orders.parquet"))

    before = {r["o_orderpriority"]: r["checksum"]
              for r in _q("rel_table_checksum", spark, str(base)).collect()}
    after = {r["o_orderpriority"]: r["checksum"]
             for r in _q("rel_table_checksum", spark, str(mut)).collect()}
    changed = [g for g in before if before[g] != after[g]]
    assert changed == [first["o_orderpriority"]]


def test_funnel_stage_times_strictly_ordered(spark):
    rows = _q("d6_funnel_steps", spark).collect()
    assert rows
    stages = {r["stage"] for r in rows}
    for r in rows:
        if r["t_click"] is not None:
            assert r["t_click"] > r["t_view"]
        else:
            assert r["stage"] == 1 and r["t_purchase"] is None
        if r["t_purchase"] is not None:
            assert r["t_purchase"] > r["t_click"]
            assert r["stage"] == 3
    # sf0.001 is dense enough that every viewer converts; just require
    # well-formed stage values (stage diversity is covered by the oracle
    # differential at sf0.01)
    assert stages and stages <= {1, 2, 3}


def test_gapfill_covers_contiguous_span(spark):
    rows = _q("d6_gapfill_ffill", spark).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert by_user
    for days in by_user.values():
        days.sort(key=lambda r: r["day"])
        span = (days[-1]["day"] - days[0]["day"]).days + 1
        assert len(days) == span  # one row per calendar day, no holes
        assert not days[0]["is_gap"]  # span starts at an observed day
        for r in days:
            assert r["filled_value"] is not None  # ffill leaves no nulls
            assert (r["n_events"] == 0) == bool(r["is_gap"])


def test_pii_redactor_leaves_no_matches(spark):
    import re

    email = re.compile(r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}")
    phone = re.compile(r"\+[0-9][0-9-]{6,}")
    rows = _q("d4_pii_redact", spark).collect()
    injected = [r for r in rows if r["doc_id"] % 7 == 0]
    assert injected
    for r in rows:
        assert not email.search(r["redacted"])
        assert not phone.search(r["redacted"])
    for r in injected:
        assert r["n_emails"] >= 1 and r["n_phones"] >= 1
        assert "<EMAIL>" in r["redacted"] and "<PHONE>" in r["redacted"]


def test_interval_bin_join_handles_bin_boundaries(spark):
    # intervals that start/end exactly on 32-day bin boundaries and points
    # on those boundaries must match exactly like a direct BETWEEN join —
    # the bin explode is an optimization, never a semantics change
    import datetime as dt

    from pyspark.sql import functions as F

    base = dt.date(2024, 1, 1)  # epoch day 19723; bins are epoch_day//32
    rows = []
    for start_off in (0, 1, 30, 31, 32, 33, 63, 64):
        for width in (0, 1, 28, 31, 32):
            rows.append(
                (base + dt.timedelta(days=start_off),
                 base + dt.timedelta(days=start_off + width))
            )
    iv = spark.createDataFrame(rows, "lo date, hi date")
    pts = spark.createDataFrame(
        [(base + dt.timedelta(days=d),) for d in range(0, 100)], "d date"
    )
    direct = (
        pts.join(iv, (F.col("d") >= F.col("lo")) & (F.col("d") <= F.col("hi")))
        .groupBy("d").count()
    )
    binned_iv = iv.select(
        "lo", "hi",
        F.explode(F.sequence(
            F.expr("CAST(datediff(lo, DATE '1970-01-01') AS BIGINT) div 32"),
            F.expr("CAST(datediff(hi, DATE '1970-01-01') AS BIGINT) div 32"),
        )).alias("bin"),
    )
    binned_pts = pts.withColumn(
        "bin", F.expr("CAST(datediff(d, DATE '1970-01-01') AS BIGINT) div 32")
    )
    via_bins = (
        binned_pts.join(binned_iv, "bin")
        .filter((F.col("d") >= F.col("lo")) & (F.col("d") <= F.col("hi")))
        .groupBy("d").count()
    )
    got = {r["d"]: r["count"] for r in via_bins.collect()}
    want = {r["d"]: r["count"] for r in direct.collect()}
    assert got == want


def test_zorder_key_roundtrips_both_dimensions(spark):
    # de-interleaving the Morton key must recover both 16-bit inputs for
    # boundary and random-ish values — the skipping stats depend on it
    from pyspark.sql import functions as F

    from bigdatainvesttink_spark.operators.layout import _zkey_spark

    vals = [0, 1, 2, 3, 255, 256, 32767, 32768, 65534, 65535, 12345, 54321]
    df = spark.createDataFrame(
        [(a, b) for a in vals for b in vals], "a long, b long"
    )
    z = df.select(
        "a", "b", F.expr(_zkey_spark("a", "b")).alias("zkey")
    )
    back_a = " + ".join(
        f"shiftleft(CAST(shiftright(zkey, {2 * j}) & 1 AS BIGINT), {j})"
        for j in range(16)
    )
    back_b = " + ".join(
        f"shiftleft(CAST(shiftright(zkey, {2 * j + 1}) & 1 AS BIGINT), {j})"
        for j in range(16)
    )
    bad = z.filter(
        (F.expr(back_a) != F.col("a")) | (F.expr(back_b) != F.col("b"))
    ).count()
    assert bad == 0
