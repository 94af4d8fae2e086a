"""Mathematical invariants of the late-round-3 operators — properties that
must hold on ANY input, independent of the oracle diff (which only proves
engine agreement, not that the math means what it claims)."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from tests.conftest import SF_SMALL


def _q(name, spark):
    return entrymod.queries()[name](spark, SF_SMALL)


def test_cms_never_undercounts(spark):
    # the Count-Min guarantee: estimate >= true count, always
    df = _q("d4_cms_heavy_hitters", spark)
    assert df.filter(F.col("overcount") < 0).count() == 0
    assert df.filter(F.col("cms_estimate") < F.col("true_count")).count() == 0


def test_bollinger_band_ordering(spark):
    df = _q("b14_bollinger", spark)
    bad = df.filter(
        (F.col("upper_band") < F.col("sma20"))
        | (F.col("sma20") < F.col("lower_band"))
    )
    assert bad.count() == 0
    # a close can't breach both sides of the band at once
    assert df.filter((F.col("breach_up") == 1) & (F.col("breach_down") == 1)).count() == 0


def test_macd_histogram_identity(spark):
    # histogram == macd - signal to the emitted rounding
    df = _q("b15_macd", spark)
    bad = df.filter(
        F.abs(F.col("histogram") - F.round(F.col("macd") - F.col("signal"), 6))
        > 1e-9
    )
    assert bad.count() == 0


def test_pack_efficiency_bounds(spark):
    df = _q("d7_pack_efficiency", spark)
    bad = df.filter(
        (F.col("fill_rate") <= 0)
        | (F.col("fill_rate") > 1.0)
        | (F.col("n_straddling") > F.col("n_docs"))
        | (F.col("n_packs") * 128 < F.col("total_tokens"))
    )
    assert bad.count() == 0


def test_dup_ngram_coverage_in_unit_interval(spark):
    df = _q("d2_dup_ngram_coverage", spark)
    bad = df.filter(
        (F.col("dup_coverage") < 0)
        | (F.col("dup_coverage") > 1)
        | (F.col("n_shared") > F.col("n_shingles"))
    )
    assert bad.count() == 0
    # the corpus view injects exact duplicates -> somebody must share
    assert df.filter(F.col("n_shared") > 0).count() > 0


def test_phash_pairs_are_exact_duplicates_under_fake_hash(spark):
    # with the md5 stand-in fingerprint, surviving pairs can only be
    # byte-identical payloads (hamming 0) — a nonzero hamming here means
    # the banding let a random collision through the verify
    df = _q("dmm_phash_neardup", spark)
    assert df.count() > 0
    assert df.filter(F.col("hamming") != 0).count() == 0


def test_tick_rule_flow_volume_consistency(spark):
    # imbalance must lie in [-1, 1]; buy+sell volumes can't exceed what the
    # signed rollup saw (carry rows classified every trade kept)
    df = _q("b18_tick_rule_flow", spark)
    bad = df.filter(
        (F.col("flow_imbalance") > 1.0) | (F.col("flow_imbalance") < -1.0)
    )
    assert bad.count() == 0


def test_fk_audit_clean_fixture_has_zero_orphans(spark):
    # the generated fixture is referentially intact — any orphan is a bug
    # in either the audit or the fixtures
    df = _q("rel_fk_orphan_audit", spark)
    assert df.count() == 6
    assert df.filter(F.col("n_orphans") != 0).count() == 0


def test_funnel_conversion_rates_bounded(spark):
    row = _q("d6_funnel_conversion", spark).collect()[0]
    assert 0 <= row["click_rate"] <= 1
    assert row["n_purchased"] <= row["n_clicked"] <= row["n_entered"]
    if row["n_clicked"]:
        assert row["avg_view_to_click_s"] > 0


def test_vocab_coverage_oov_bounds(spark):
    df = _q("d4_vocab_coverage", spark)
    bad = df.filter(
        (F.col("oov_rate") < 0)
        | (F.col("oov_rate") > 1)
        | (F.col("n_oov") > F.col("n_tokens"))
    )
    assert bad.count() == 0


def test_pagerank_is_a_probability_distribution(spark):
    # ranks positive, total mass ~1 (up to the per-iteration 6dp rounding
    # and the teleport term over N nodes)
    df = _q("d2_pagerank_fixed", spark)
    rows = df.collect()
    assert all(r["pagerank"] > 0 for r in rows)
    total = sum(r["pagerank"] for r in rows)
    assert abs(total - 1.0) < 0.05, total
