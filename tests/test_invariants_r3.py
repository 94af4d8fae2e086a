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


def test_twap_within_tick_price_range(spark):
    # a time-weighted mean must lie inside [min, max] tick price per group
    from bigdatainvesttink_spark.fixtures import domain_table

    twap = _q("b23_twap", spark)
    bounds = (
        domain_table(spark, SF_SMALL, "trades")
        .groupBy("company_id", F.date_trunc("day", "ts").cast("timestamp").alias("day"))
        .agg(F.min("price").alias("lo"), F.max("price").alias("hi"))
    )
    j = twap.join(bounds, ["company_id", "day"])
    assert j.count() == twap.count()
    bad = j.filter(
        (F.col("twap_price") < F.col("lo") - 1e-6)
        | (F.col("twap_price") > F.col("hi") + 1e-6)
    )
    assert bad.count() == 0


def test_twap_single_shuffle(spark):
    # the day-grain aggregation must reuse the lead-window partitioning
    plan = (
        _q("b23_twap", spark)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1


def test_cusum_drift_day_in_candle_span(spark):
    from bigdatainvesttink_spark.fixtures import domain_table

    cu = _q("b24_cusum_drift", spark)
    span = (
        domain_table(spark, SF_SMALL, "candles")
        .groupBy("company_id")
        .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
    )
    j = cu.join(span, "company_id")
    assert j.filter(
        (F.col("drift_day") < F.date_trunc("day", "lo"))
        | (F.col("drift_day") > F.col("hi"))
    ).count() == 0
    assert cu.filter(F.col("max_cusum") < 0).count() == 0


def test_triangle_participation_is_three_per_triangle(spark):
    # sum of per-node participation counts = 3 * total triangles exactly
    df = _q("d2_triangle_count", spark)
    total = df.agg(F.sum("n_triangles")).collect()[0][0]
    assert total is not None and total > 0 and total % 3 == 0
    assert df.filter(F.col("n_triangles") <= 0).count() == 0


def test_cooccurrence_support_bounds(spark):
    # pair support can never exceed either item's basket support
    df = _q("d6_cooccurrence_pairs", spark)
    assert df.count() > 0
    bad = df.filter(
        (F.col("n_ab") > F.col("n_a"))
        | (F.col("n_ab") > F.col("n_b"))
        | (F.col("lift") <= 0)
        | (F.col("item_a") >= F.col("item_b"))
    )
    assert bad.count() == 0


def test_interval_sweep_conservation(spark):
    # every opened interval closes: the final running count returns to 0,
    # and the peak concurrency is positive
    df = _q("rel_interval_sweep", spark).orderBy(F.col("day").asc())
    rows = df.collect()
    assert rows[-1].n_open == 0
    assert max(r.n_open for r in rows) > 0
    assert all(r.n_open >= 0 for r in rows)
    # n_open is the prefix sum of net_change
    acc = 0
    for r in rows:
        acc += r.net_change
        assert acc == r.n_open


def test_expectations_report_checks(spark):
    df = _q("rel_expectations_report", spark)
    rows = {r.check_name: r for r in df.collect()}
    assert len(rows) == 6
    # the fixture's orders are key-clean and FK-closed...
    for chk in ("null_custkey", "duplicate_orderkey", "orphan_custkey"):
        assert rows[chk].passed and rows[chk].n_violations == 0
    # ...but deliberately extend past the classic TPC-H date horizon,
    # which the report must surface, not mask
    assert not rows["orderdate_out_of_range"].passed
    assert all((r.n_violations == 0) == r.passed for r in rows.values())


def test_knn_accuracy_bounds(spark):
    df = _q("d3_knn_classify", spark)
    assert df.count() > 0
    bad = df.filter(
        (F.col("n_correct") > F.col("n_queries"))
        | (F.col("accuracy") < 0)
        | (F.col("accuracy") > 1)
    )
    assert bad.count() == 0


def test_pmi_support_bounds_and_rank(spark):
    df = _q("d4_collocations_pmi", spark)
    rows = df.collect()
    assert 0 < len(rows) <= 50
    assert sorted(r.rnk for r in rows) == list(range(1, len(rows) + 1))
    assert all(
        r.n_ab >= 5 and r.n_ab <= r.n_first and r.n_ab <= r.n_second
        for r in rows
    )


def test_clustering_coefficient_bounds(spark):
    cc = _q("d2_clustering_coefficient", spark)
    bad = cc.filter(
        (F.col("clustering_coeff") < 0) | (F.col("clustering_coeff") > 1)
    )
    assert bad.count() == 0
    # triangle participation agrees with the standalone triangle query
    tri = _q("d2_triangle_count", spark)
    j = cc.filter(F.col("n_triangles") > 0).join(
        tri.withColumnRenamed("n_triangles", "t2"), "node"
    )
    assert j.filter(F.col("n_triangles") != F.col("t2")).count() == 0


def test_depth_profile_monotone_share(spark):
    # depth profile is the 'depth_profile' section of the b5b book-depth
    # suite since the r8 registry fold (COVERAGE.md group 6).
    df = (
        _q("b5b_depth_imbalance", spark)
        .filter(F.col("section") == "depth_profile")
        .orderBy("company_id", "lvl")
    )
    from collections import defaultdict

    by_company = defaultdict(list)
    for r in df.collect():
        by_company[r.company_id].append(r)
    assert by_company
    for rows in by_company.values():
        shares = [r.cum_depth_share for r in rows]
        assert all(b >= a for a, b in zip(shares, shares[1:]))
        assert abs(shares[-1] - 1.0) < 1e-12
        assert all(1 <= r.avg_bid_vol <= 499 and 1 <= r.avg_ask_vol <= 499
                   for r in rows)


def test_survival_curve_monotone_nonincreasing(spark):
    rows = (
        _q("d6_survival_km", spark)
        .orderBy(F.col("duration_h").asc())
        .collect()
    )
    assert rows
    surv = [r.survival for r in rows]
    assert all(0 < s_val < 1 for s_val in surv)
    assert all(b <= a for a, b in zip(surv, surv[1:]))
    # the risk set shrinks as duration grows
    risk = [r.n_at_risk for r in rows]
    assert all(b < a for a, b in zip(risk, risk[1:]))
    assert all(0 < r.n_churned < r.n_at_risk for r in rows)


def test_range_volatility_nonnegative_parkinson(spark):
    df = _q("b26_range_volatility", spark)
    assert df.count() > 0
    # Parkinson variance is a mean of squares — never negative
    assert df.filter(F.col("parkinson_var") < 0).count() == 0
    # flat bars (high == low == open == close) contribute zero, so any
    # all-flat day must read exactly 0 for both estimators
    flat = df.filter(F.col("parkinson_var") == 0)
    assert flat.filter(F.abs(F.col("garman_klass_var")) > 1e-12).count() == 0


def test_active_users_wau_bounds(spark):
    rows = _q("d6_active_users", spark).collect()
    assert rows
    for r in rows:
        # a day's actives are a subset of its trailing week's actives
        assert r.dau <= r.wau
        assert 0 < r.stickiness <= 1.0


def test_microprice_between_bid_and_ask(spark):
    from bigdatainvesttink_spark.fixtures import domain_table

    mp = _q("b27_microprice", spark)
    book = (
        domain_table(spark, SF_SMALL, "order_book")
        .groupBy(
            "company_id",
            F.date_trunc("day", "ts").cast("timestamp").alias("day"),
        )
        .agg(F.min("bid_price").alias("lo"), F.max("ask_price").alias("hi"))
    )
    j = mp.join(book, ["company_id", "day"])
    assert j.count() == mp.count() and mp.count() > 0
    bad = j.filter(
        (F.col("avg_microprice") < F.col("lo") - 1e-6)
        | (F.col("avg_microprice") > F.col("hi") + 1e-6)
    )
    assert bad.count() == 0
    # bias is bounded by the half-spread (0.1% of mid in the fixture)
    assert mp.filter(F.abs("avg_micro_mid_bias") > 1.0).count() == 0


def test_amihud_nonnegative(spark):
    df = _q("b28_amihud_illiquidity", spark)
    assert df.count() > 0
    assert df.filter(F.col("amihud_illiq") < 0).count() == 0
    assert df.filter(F.col("n_days") <= 0).count() == 0


def test_staleness_max_at_least_avg(spark):
    df = _q("a_snapshot_staleness", spark)
    assert df.count() > 0
    bad = df.filter(
        (F.col("max_gap_us") < F.col("avg_gap_us"))
        | (F.col("max_gap_us") <= 0)
    )
    assert bad.count() == 0


def test_threshold_sweep_monotone(spark):
    rows = sorted(
        _q("d3_dedup_threshold_sweep", spark).collect(),
        key=lambda r: r.threshold,
    )
    assert rows
    # raising the threshold can only shrink the flagged set
    for lo, hi in zip(rows, rows[1:]):
        assert hi.n_pairs <= lo.n_pairs
        assert hi.n_docs_flagged <= lo.n_docs_flagged
    for r in rows:
        # each pair flags at most 2 docs, at least... 2 docs can cover
        # many pairs, so: n_docs <= 2 * n_pairs and n_docs >= 2 (if any)
        if r.n_pairs > 0:
            assert 2 <= r.n_docs_flagged <= 2 * r.n_pairs


def test_stream_corpus_curation_matches_batch(spark):
    # the streaming curation result must equal the batch dedup+gate answer
    from bigdatainvesttink_spark.io import load_table

    got = {
        (r.source): (r.n_unique_docs, r.total_chars)
        for r in _q("c_stream_corpus_curation", spark).collect()
    }
    d = load_table(spark, SF_SMALL, "documents").filter(
        (F.col("text") != "") & (F.col("n_chars") >= 200)
    )
    want = {
        (r.source): (r.n, r.t)
        for r in d.select("source", "text", "n_chars")
        .distinct()
        .groupBy("source")
        .agg(
            F.count("*").alias("n"),
            F.sum("n_chars").cast("bigint").alias("t"),
        )
        .collect()
    }
    assert got == want and got


def test_anomaly_alerts_all_exceed_threshold(spark):
    df = _q("c_stream_anomaly_alerts", spark)
    assert df.count() > 0
    assert df.filter(F.abs(F.col("zscore")) <= 2.0).count() == 0


def test_roll_spread_sign_convention(spark):
    # Roll estimator lives in the b4_autocorr suite since the r8 registry
    # fold (COVERAGE.md group 4); rows without a roll section are the
    # FULL-OUTER remainder of the other sections.
    rows = (
        _q("b4_autocorr", spark)
        .filter(F.col("n_deltas").isNotNull())
        .collect()
    )
    assert rows
    for r in rows:
        if r.serial_cov < 0:
            assert r.roll_spread is not None and r.roll_spread > 0
            # spread^2 / 4 == -cov to float precision
            assert abs(r.roll_spread**2 / 4 + r.serial_cov) < 1e-9
        else:
            assert r.roll_spread is None


def test_variance_ratio_positive(spark):
    df = _q("b30_variance_ratio", spark)
    assert df.count() > 0
    assert df.filter(F.col("variance_ratio") <= 0).count() == 0


def test_temperature_mix_flattens_distribution(spark):
    rows = _q("d7_temperature_mix", spark).collect()
    assert rows
    total = sum(r.natural_tokens for r in rows)
    for r in rows:
        assert 0 < r.temp_share < 1
        assert 0 < r.rate_ppm <= 1_000_000
        assert r.sampled_docs > 0 and r.sampled_tokens > 0
        # alpha < 1 compresses toward uniform: low-resource langs get a
        # larger share than natural, high-resource a smaller one
        natural = r.natural_tokens / total
        if natural < 1.0 / len(rows):
            assert r.temp_share > natural
        elif natural > 1.0 / len(rows):
            assert r.temp_share < natural
    # shares normalize
    assert abs(sum(r.temp_share for r in rows) - 1.0) < 1e-4


def test_json_nested_roundtrip_preserves_sums(spark):
    from bigdatainvesttink_spark.io import load_table

    got = {
        r.event_type: (r.n_events, r.sum_doubled, r.uid_sum)
        for r in _q("d6_json_nested_roundtrip", spark).collect()
    }
    want = {
        r.event_type: (r.n, r.s, r.u)
        for r in load_table(spark, SF_SMALL, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum((F.col("value") * 2.0).cast("decimal(27,6)"))
            .cast("double")
            .alias("s"),
            F.sum("user_id").cast("bigint").alias("u"),
        )
        .collect()
    }
    assert got == want and got


def test_golden_record_fields_survive_nulls(spark):
    # survivorship must never produce a null field for a key that has at
    # least one non-null version, and counts must be consistent
    df = _q("d1_golden_record", spark)
    rows = df.collect()
    assert rows
    for r in rows:
        assert r.n_value_versions <= r.n_versions
        assert r.n_k_versions <= r.n_versions
        if r.n_value_versions > 0:
            assert r.golden_value is not None
        if r.n_k_versions > 0:
            assert r.golden_k is not None


def test_vpin_bounds(spark):
    df = _q("b31_vpin_toxicity", spark)
    assert df.count() > 0
    bad = df.filter(
        (F.col("vpin") < 0) | (F.col("vpin") > 1) | (F.col("n_buckets") <= 0)
    )
    assert bad.count() == 0


def test_assortativity_in_valid_range(spark):
    rows = _q("d2_degree_assortativity", spark).collect()
    assert len(rows) == 1
    r = rows[0]
    assert -1.0 - 1e-9 <= r.assortativity <= 1.0 + 1e-9
    assert r.n_directed_edges > 0 and r.n_directed_edges % 2 == 0


def test_length_bucket_packing_accounting(spark):
    rows = _q("d7_length_bucket_packing", spark).collect()
    assert rows
    for r in rows:
        assert r.docs_per_pack >= 1
        assert r.n_packs * r.docs_per_pack >= r.n_docs
        assert 0 <= r.padded_slots < r.docs_per_pack
        assert r.wasted_tokens >= 0
        assert 0 < r.fill_rate <= 1.0
        # a doc in bucket cap uses at most cap tokens of its slot
        assert r.n_docs <= r.n_packs * r.docs_per_pack


def test_forecast_backtest_mae_nonnegative(spark):
    rows = _q("b32_forecast_backtest", spark).collect()
    assert rows
    for r in rows:
        assert r.mae_naive >= 0 and r.mae_seasonal >= 0
        want = "naive" if r.mae_naive <= r.mae_seasonal else "seasonal"
        assert r.winner == want


def test_truncation_recall_bounds(spark):
    df = _q("d3_truncation_recall_eval", spark)
    rows = df.collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_hits <= 5
        assert abs(r.recall_at_5 - r.n_hits / 5.0) < 1e-12


def test_candle_patterns_counts_bounded(spark):
    rows = _q("b33_candle_patterns", spark).collect()
    assert rows
    for r in rows:
        for col in ("n_doji", "n_hammer", "n_shooting_star",
                    "n_bull_engulf", "n_bear_engulf"):
            assert 0 <= getattr(r, col) <= r.n_candles
    # at least one pattern fires somewhere in the fixture
    assert any(
        r.n_doji + r.n_hammer + r.n_shooting_star
        + r.n_bull_engulf + r.n_bear_engulf > 0
        for r in rows
    )


def test_ks_drift_bounds(spark):
    rows = _q("d4_ks_length_drift", spark).collect()
    assert rows
    for r in rows:
        assert 0 <= r.ks_stat <= 1.0
        assert r.n_docs > 0


def test_bfs_reach_monotone(spark):
    rows = sorted(_q("d2_bfs_reach_hops", spark).collect(), key=lambda r: r.hop)
    assert rows and rows[0].hop == 0
    for prev, cur in zip(rows, rows[1:]):
        assert cur.n_reached >= prev.n_reached
        assert cur.n_new == cur.n_reached - prev.n_reached
        assert cur.n_new >= 0
    assert rows[0].n_reached == rows[0].n_new > 0


def test_scd3_consistent_with_compaction(spark):
    # SCD3's current value must equal SCD1's (latest-wins) value
    scd3 = _q("d1_scd3_prev_value", spark)
    scd1 = _q("d1_compact_latest", spark)
    j = scd3.join(scd1, ["user_id", "event_type"])
    assert j.count() == scd3.count() > 0
    assert j.filter(F.col("current_value") != F.col("latest_value")).count() == 0
    # previous exists iff more than one version
    assert scd3.filter(
        (F.col("n_versions") >= 2) & F.col("previous_value").isNull()
    ).count() == 0
    assert scd3.filter(
        (F.col("n_versions") == 1) & F.col("previous_value").isNotNull()
    ).count() == 0


def test_overnight_gaps_accounting(spark):
    rows = _q("b34_overnight_gaps", spark).collect()
    assert rows
    for r in rows:
        assert r.n_gap_up + r.n_gap_down <= r.n_gaps
        assert r.n_gaps > 0


def test_adamic_adar_excludes_existing_edges(spark):
    rows = _q("d2_adamic_adar_topk", spark).collect()
    assert rows
    assert sorted(r.rnk for r in rows) == list(range(1, len(rows) + 1))
    for r in rows:
        assert r.pa < r.pb
        assert r.n_common >= 1
        assert r.aa_score > 0


def test_passage_chunks_cover_and_overlap(spark):
    from collections import defaultdict

    rows = _q("d4_passage_chunks", spark).collect()
    assert rows
    by_doc = defaultdict(list)
    for r in rows:
        by_doc[r.doc_id].append(r)
    for doc, ch in by_doc.items():
        ch.sort(key=lambda r: r.chunk_idx)
        assert [c.chunk_idx for c in ch] == list(range(len(ch)))
        # full coverage: last chunk reaches the doc's end, starts align
        # to the stride grid, and consecutive chunks overlap (w > s)
        for c in ch:
            assert c.start_tok == c.chunk_idx * 48 + 1
            assert c.n_tokens == c.end_tok - c.start_tok + 1
            assert c.head_token is not None
        for a, b in zip(ch, ch[1:]):
            assert b.start_tok <= a.end_tok + 1


def test_blocklist_flag_rate_consistent(spark):
    rows = _q("d4_blocklist_filter", spark).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_flagged <= r.n_docs
        assert abs(r.flag_rate - r.n_flagged / r.n_docs) < 1e-12
        assert r.total_hits >= r.n_flagged * 3


def test_chi2_nonnegative_and_dof(spark):
    rows = _q("rel_chi2_independence", spark).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.chi2 >= 0 and r.dof >= 1
    assert r.n_cells >= r.dof + 1


def test_volume_profile_share_bounds(spark):
    rows = _q("b35_volume_profile_poc", spark).collect()
    assert rows
    for r in rows:
        assert 0 < r.poc_share <= 1.0
        assert 0 < r.poc_volume <= r.total_volume


def test_nprobe_sweep_monotone_recall_and_cost(spark):
    rows = sorted(
        _q("d3_ivf_nprobe_sweep", spark).collect(), key=lambda r: r.nprobe
    )
    assert [r.nprobe for r in rows] == [1, 2, 4]
    for lo, hi in zip(rows, rows[1:]):
        # widening the probe can only add candidates and hits
        assert hi.n_candidates >= lo.n_candidates
        assert hi.n_hits >= lo.n_hits
        assert hi.recall_at_5 >= lo.recall_at_5
    for r in rows:
        assert 0 <= r.recall_at_5 <= 1


def test_pretrain_pipeline_internally_consistent(spark):
    rows = _q("d7_pretrain_pipeline_report", spark).collect()
    assert rows
    for r in rows:
        assert 0 < r.rate_ppm <= 1_000_000
        assert r.n_tokens_sampled <= r.natural_tokens
        # every sampled doc yields at least one chunk
        assert r.n_chunks >= r.n_docs_sampled
        if r.n_docs_sampled == 0:
            assert r.n_tokens_sampled == 0 and r.n_chunks == 0


def test_obv_daily_rollup_consistent(spark):
    df = _q("b36_obv", spark)
    assert df.count() > 0
    assert df.filter(F.col("n_bars") <= 0).count() == 0


def test_stochastic_bounds(spark):
    df = _q("b37_stochastic_oscillator", spark)
    assert df.count() > 0
    bad = df.filter(
        (F.col("pct_k") < 0) | (F.col("pct_k") > 100)
        | (F.col("pct_d") < 0) | (F.col("pct_d") > 100)
    )
    assert bad.count() == 0


def test_new_returning_partition_dau(spark):
    rows = _q("d6_new_vs_returning", spark).collect()
    assert rows
    for r in rows:
        assert r.new_users + r.returning_users == r.dau
        assert 0 <= r.new_share <= 1
    # the earliest day is all-new
    first = min(rows, key=lambda r: r.day)
    assert first.new_users == first.dau


def test_relational_division_subset_of_buyers(spark):
    div = _q("rel_division_all_quarters", spark)
    rows = div.collect()
    # every qualifying customer covers exactly the full quarter set
    if rows:
        n_q = rows[0].n_quarters
        assert all(r.n_quarters == n_q for r in rows)


def test_not_in_null_trap_holds(spark):
    r = _q("rel_not_in_null_semantics", spark).collect()[0]
    assert r.n_not_in_with_null == 0            # ANSI: NULL poisons NOT IN
    assert r.n_not_in_filtered == r.n_not_exists > 0


def test_boilerplate_spread_bounds(spark):
    rows = _q("d4_boilerplate_chunks", spark).collect()
    assert rows
    for r in rows:
        assert r.n_docs >= 3
        assert r.n_occurrences >= r.n_docs
        assert len(r.sample_text.split(" ")) == 16


def test_momentum_quintiles_partition(spark):
    rows = sorted(
        _q("b38_momentum_quintiles", spark).collect(),
        key=lambda r: r.quintile,
    )
    assert [r.quintile for r in rows] == list(range(1, len(rows) + 1))
    assert len(rows) <= 5
    # trailing means must increase with the quintile by construction
    trail = [r.avg_trailing for r in rows]
    assert all(b >= a for a, b in zip(trail, trail[1:]))


def test_erasure_audit_shares(spark):
    rows = {r.table_name: r for r in _q("d1_erasure_audit", spark).collect()}
    assert set(rows) == {"events", "trades"}
    for r in rows.values():
        assert 0 <= r.n_to_erase <= r.n_rows
        assert abs(r.erase_share - r.n_to_erase / r.n_rows) < 1e-12
    # trades derive 1:1 from events, so the blast radius matches
    assert rows["events"].n_to_erase == rows["trades"].n_to_erase


def test_shard_manifest_covers_corpus(spark):
    from bigdatainvesttink_spark.io import load_table

    rows = _q("d7_shard_manifest", spark).collect()
    assert rows
    total = load_table(spark, SF_SMALL, "documents").filter(
        F.col("text") != ""
    ).count()
    assert sum(r.n_docs for r in rows) == total
    assert all(r.total_tokens > 0 for r in rows)


def test_return_moments_kurtosis_floor(spark):
    df = _q("b39_return_moments", spark)
    assert df.count() > 0
    # excess kurtosis is bounded below by skew^2 - 2 (Pearson inequality)
    bad = df.filter(
        F.col("excess_kurtosis")
        < F.col("skewness") * F.col("skewness") - 2.0 - 1e-6
    )
    assert bad.count() == 0


def test_underwater_spells_within_series(spark):
    # spells live in the b12_max_drawdown suite since the r8 registry fold
    # (COVERAGE.md group 3); LEFT-JOIN remainder rows carry NULL spells.
    rows = (
        _q("b12_max_drawdown", spark)
        .filter(F.col("n_spells").isNotNull())
        .collect()
    )
    assert rows
    for r in rows:
        assert r.n_spells >= 1
        assert r.longest_bars >= 1
        assert r.longest_start <= r.longest_end


def test_overnight_intraday_rows_align_with_gaps(spark):
    # the decomposition runs on the same day grid as b34's gap study
    a = _q("b41_overnight_intraday_split", spark)
    b = _q("b34_overnight_gaps", spark)
    ja = {r.company_id: r.n_days for r in a.collect()}
    jb = {r.company_id: r.n_gaps for r in b.collect()}
    assert ja and ja.keys() == jb.keys()
    assert all(ja[k] == jb[k] for k in ja)


def test_harmonic_centrality_bounds(spark):
    rows = _q("d2_harmonic_centrality", spark).collect()
    assert rows
    for r in rows:
        # each source contributes at most 1.0 (distance >= 1)
        assert 0 < r.harmonic <= r.n_sources + 1e-9
        assert r.n_sources >= 1


def test_fd_discovery_known_truths(spark):
    rows = {r.candidate: r for r in _q("rel_fd_discovery", spark).collect()}
    # keys determine everything; attributes don't determine keys' range
    assert rows["o_orderkey->o_custkey"].fd_holds
    assert rows["c_custkey->c_nationkey"].fd_holds
    for r in rows.values():
        assert r.n_pairs >= r.n_det
        assert r.fd_holds == (r.n_pairs == r.n_det)


def test_markov_stationary_is_distribution(spark):
    rows = _q("d6_markov_stationary", spark).collect()
    assert rows
    total = sum(r.stationary_prob for r in rows)
    # rounded fixed point: sums to 1 within the 6dp grid accumulation
    assert abs(total - 1.0) < 1e-3
    assert all(r.stationary_prob > 0 for r in rows)


def test_price_clustering_shares_partition(spark):
    rows = _q("b42_price_clustering", spark).collect()
    assert rows
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-12
    for r in rows:
        assert 0 <= r.quarter_bucket <= 3
        assert r.n_exact_integer <= r.n_trades


def test_burstiness_in_range(spark):
    df = _q("d6_burstiness", spark)
    assert df.count() > 0
    bad = df.filter(
        (F.col("burstiness") <= -1) | (F.col("burstiness") >= 1)
    )
    assert bad.count() == 0


def test_behavior_entropy_bounds(spark):
    rows = _q("d6_behavior_entropy", spark).collect()
    assert rows
    import math

    for r in rows:
        assert r.entropy_bits >= -1e-9
        assert r.entropy_bits <= math.log2(max(r.n_types, 1)) + 1e-3
        if r.n_types == 1:
            assert r.normalized_entropy is None
            assert abs(r.entropy_bits) < 1e-9
        else:
            assert -1e-9 <= r.normalized_entropy <= 1.0 + 1e-3


def test_dlq_roundtrip_conserves_wire(spark):
    from bigdatainvesttink_spark.fixtures import domain_table

    rows = {
        (r.disposition, r.reason): r.n_rows
        for r in _q("c_stream_dlq_roundtrip", spark).collect()
    }
    total = domain_table(spark, SF_SMALL, "trades").count()
    # every wire line lands exactly once on one side
    assert sum(rows.values()) == total
    assert rows[("clean", "landed")] > 0
    assert rows.get(("rejected", "missing_required"), 0) > 0


def test_dow_effect_partitions_days(spark):
    # DOW effect is the 'dow_return' section of the b22 calendar-bucket
    # suite since the r8 registry fold (COVERAGE.md group 9).
    rows = (
        _q("b22_intraday_seasonality", spark)
        .filter(F.col("section") == "dow_return")
        .collect()
    )
    assert rows
    assert all(1 <= r.bucket <= 7 for r in rows)
    assert all(0 <= r.positive_share <= 1 for r in rows)
    # pooled observations = all (company, day) return rows
    from bigdatainvesttink_spark.fixtures import domain_table

    total = sum(r.n_obs for r in rows)
    daily = (
        domain_table(spark, SF_SMALL, "candles")
        .groupBy("company_id", F.date_trunc("day", "ts"))
        .count()
        .groupBy("company_id")
        .count()
    )
    want = sum(r["count"] - 1 for r in daily.collect())
    assert total == want


def test_attribution_models_conserve_purchases(spark):
    # both credit models must distribute exactly the purchase total
    ft = _q("d6_attribution_first_touch", spark)
    lt = _q("d6_attribution_last_touch", spark)
    n_ft = ft.agg(F.sum("n_purchases")).collect()[0][0]
    n_lt = lt.agg(F.sum("n_purchases")).collect()[0][0]
    assert n_ft == n_lt and n_ft > 0


def test_iqr_outliers_sane(spark):
    rows = _q("rel_iqr_outliers", spark).collect()
    assert rows
    for r in rows:
        assert r.q1 <= r.q3
        assert r.n_low_outliers + r.n_high_outliers < r.n_rows
        # fences at 1.5 IQR keep at least half the data inside
        assert (r.n_low_outliers + r.n_high_outliers) <= r.n_rows // 2


def test_warehouse_health_clean_fixture(spark):
    rows = {
        (r.metric, r.subject): r.value
        for r in _q("rel_warehouse_health", spark).collect()
    }
    assert rows[("fk_orphans", "orders->customer")] == 0
    assert rows[("fk_orphans", "lineitem->orders")] == 0
    # keys are unique in the fixture
    assert rows[("row_count", "customer")] == rows[("distinct_keys", "customer")]
    assert rows[("row_count", "orders")] == rows[("distinct_keys", "orders")]
    assert rows[("freshness_epoch_day", "orders")] > 0


def test_packing_compare_tradeoff_direction(spark):
    rows = {r.strategy: r for r in _q("d7_packing_strategy_compare", spark).collect()}
    assert set(rows) == {"concat_chunk", "length_bucketed"}
    cc, lb = rows["concat_chunk"], rows["length_bucketed"]
    assert cc.n_docs == lb.n_docs
    # concat-chunk can never waste more than bucketing on the same corpus
    assert cc.wasted_tokens <= lb.wasted_tokens
    assert cc.fill_rate >= lb.fill_rate
    assert cc.n_packs <= lb.n_packs


def test_small_world_stats_consistency(spark):
    r = _q("d2_small_world_stats", spark).collect()[0]
    assert r.n_nodes > 0 and r.n_edges > 0
    assert 0 <= r.global_clustering <= 1
    assert 1.0 <= r.mean_path_len_capped3 <= 3.0
    # triangles agree with the standalone count
    tri = _q("d2_triangle_count", spark)
    total = tri.agg(F.sum("n_triangles")).collect()[0][0]
    assert r.n_triangles == total // 3


def test_unigram_entropy_bounds(spark):
    import math

    r = _q("d4_unigram_entropy", spark).collect()[0]
    assert 0 < r.entropy_bits <= math.log2(r.n_types) + 1e-3
    assert 1 <= r.perplexity <= r.n_types + 1
    assert abs(r.perplexity - 2**r.entropy_bits) < 1e-3


def test_punchcard_covers_all_events(spark):
    from bigdatainvesttink_spark.io import load_table

    rows = _q("d6_activity_punchcard", spark).collect()
    assert rows
    total = load_table(spark, SF_SMALL, "events").count()
    assert sum(r.n_events for r in rows) == total
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-9
    for r in rows:
        assert 1 <= r.day_of_week <= 7 and 0 <= r.hour_of_day <= 23
        assert 0 < r.n_users <= r.n_events
