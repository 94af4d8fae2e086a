"""Session-4b operators: invariants beyond the oracle equality."""

from __future__ import annotations

from bisect import bisect_left, bisect_right
from math import floor

import __spark_entry__ as entrymod
from bigdatainvesttink_spark.io import load_table
from tests.conftest import SF_SMALL


def _q(name, spark):
    return entrymod.queries()[name](spark, SF_SMALL)


def test_mann_whitney_matches_bruteforce(spark):
    row = _q("d6_mann_whitney", spark).collect()[0]
    vals = (
        load_table(spark, SF_SMALL, "events")
        .filter("event_type IN ('click', 'purchase')")
        .select("event_type", "value")
        .collect()
    )
    a = sorted(floor(r["value"] * 10) for r in vals if r["event_type"] == "click")
    b = sorted(
        floor(r["value"] * 10) for r in vals if r["event_type"] == "purchase"
    )
    u = 0.0
    for x in a:
        u += bisect_left(b, x) + 0.5 * (bisect_right(b, x) - bisect_left(b, x))
    n1, n2 = len(a), len(b)
    assert row["n_click"] == n1 and row["n_purchase"] == n2
    assert row["u_stat"] == u
    assert abs(row["auc"] - u / (n1 * n2)) < 1e-6
    assert 0.0 <= row["auc"] <= 1.0
    # z sign agrees with the direction of the effect (AUC vs 1/2)
    if row["auc"] > 0.5:
        assert row["z"] > 0
    elif row["auc"] < 0.5:
        assert row["z"] < 0


def test_theilsen_matches_bruteforce(spark):
    import statistics

    rows = _q("rel_theilsen_slope", spark).collect()
    got = {r["nation"]: r for r in rows}

    import pyspark.sql.functions as F

    from bigdatainvesttink_spark.functions import dsum

    o = load_table(spark, SF_SMALL, "orders")
    c = load_table(spark, SF_SMALL, "customer")
    n = load_table(spark, SF_SMALL, "nation")
    monthly = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(n, c["c_nationkey"] == n["n_nationkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
            .cast("long")
            .alias("m"),
        )
        .agg(dsum("o_totalprice", "rev"))
        .collect()
    )
    series: dict[str, list] = {}
    for r in monthly:
        series.setdefault(r["nation"], []).append((r["m"], r["rev"]))
    assert set(got) == set(series)
    for nation, pts in series.items():
        pts.sort()
        slopes = [
            (r2 - r1) / (m2 - m1)
            for i, (m1, r1) in enumerate(pts)
            for (m2, r2) in pts[i + 1 :]
        ]
        assert got[nation]["n_months"] == len(pts)
        assert got[nation]["n_pairs"] == len(slopes)
        assert got[nation]["ts_slope"] == statistics.median(slopes), nation


def test_mmr_rerank_matches_numpy_replica(spark):
    import numpy as np

    got: dict[tuple, object] = {}
    for r in _q("d3_mmr_rerank", spark).collect():
        got[(r["query_id"], r["pick"])] = (r["neighbor_id"], r["mmr_score"])
    emb = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in load_table(spark, SF_SMALL, "embeddings").collect()
    }
    norms = {k: float(np.sqrt(np.dot(v, v))) for k, v in emb.items()}

    def cos(a, b):
        # sequential-order fold to match the HOF/list_dot_product sum order
        s = 0.0
        for x, y in zip(emb[a], emb[b]):
            s += x * y
        return round(s / (norms[a] * norms[b]), 6)

    queries = sorted(k for k in emb if k % 10 == 0)
    for qid in queries:
        rel = {n: cos(qid, n) for n in emb if n != qid}
        topk = sorted(rel, key=lambda n: (-rel[n], n))[:8]
        picks = [min(topk, key=lambda n: (-rel[n], n))]
        for _ in range(2):
            cand = [n for n in topk if n not in picks]
            score = {
                n: 0.7 * rel[n] - 0.3 * max(cos(n, p) for p in picks)
                for n in cand
            }
            picks.append(min(cand, key=lambda n: (-score[n], n)))
            last_score = score[picks[-1]]
        for i, p in enumerate(picks, 1):
            g_nid, g_score = got[(qid, i)]
            assert g_nid == p, (qid, i)
        # spot-check the last pick's score value as well
        assert abs(got[(qid, 3)][1] - last_score) < 1e-12, qid
        # all three picks distinct
        assert len({got[(qid, i)][0] for i in (1, 2, 3)}) == 3


def test_stream_cdc_upsert_equals_batch_cdc_apply(spark):
    stream_rows = {
        (r["user_id"], r["event_type"]): (
            r["final_ts"],
            r["final_value"],
            r["n_ops"],
        )
        for r in _q("c_stream_cdc_upsert", spark).collect()
    }
    batch_rows = {
        (r["user_id"], r["event_type"]): (
            r["final_ts"],
            r["final_value"],
            r["n_ops"],
        )
        for r in _q("d1_cdc_apply", spark).collect()
    }
    assert stream_rows == batch_rows
    assert len(stream_rows) > 0


def test_mad_outliers_invariants(spark):
    rows = _q("rel_mad_outliers", spark).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["mad"] >= 0
        assert 0 <= r["n_outliers"] < r["n_rows"]
    # MAD is never larger than half the full range, med inside [min, max]
    import pyspark.sql.functions as F

    o = load_table(spark, SF_SMALL, "orders")
    stats = {
        r["o_orderpriority"]: r
        for r in o.groupBy("o_orderpriority")
        .agg(F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi"))
        .collect()
    }
    for r in rows:
        s = stats[r["o_orderpriority"]]
        assert s["lo"] <= r["med"] <= s["hi"]


def test_riskmetrics_vol_invariants(spark):
    # RiskMetrics vol is the 'riskmetrics_vol' section of the b11 EWMA
    # suite since the r8 registry fold (COVERAGE.md group 1).
    rows = (
        _q("b11_ewma_price", spark)
        .filter("section = 'riskmetrics_vol'")
        .collect()
    )
    assert len(rows) > 0
    by_company: dict[int, list] = {}
    for r in rows:
        assert r["rm_vol"] is not None and r["rm_vol"] >= 0
        assert 1 <= r["n_terms"] <= 20
        by_company.setdefault(r["company_id"], []).append(r)
    for evs in by_company.values():
        evs.sort(key=lambda r: r["ts"])
        # warmup ramps 1, 2, ..., then saturates at 20
        for i, r in enumerate(evs):
            assert r["n_terms"] == min(i + 1, 20)


def test_mahalanobis_avg_is_dim(spark):
    """Population-variance normalization makes the per-label mean of
    md2_own exactly the dimensionality (64), up to float accumulation."""
    rows = _q("d3_ood_mahalanobis", spark).collect()
    assert len(rows) > 0
    by_label: dict[int, list] = {}
    for r in rows:
        assert r["md2_own"] >= 0 and r["md2_global"] >= 0
        assert r["is_outlier"] == (1 if r["md2_own"] > 68.0 else 0)
        by_label.setdefault(r["label"], []).append(r["md2_own"])
    for label, vals in by_label.items():
        assert abs(sum(vals) / len(vals) - 64.0) < 1e-9, label


def test_pit_features_no_leakage_bruteforce(spark):
    """Features must count only strictly-earlier events (no label peeking):
    full brute-force replica per purchase at sf0.001."""
    got = {r["event_id"]: r for r in _q("d6_pit_features", spark).collect()}
    from datetime import datetime, timedelta

    epoch = datetime(1970, 1, 1)
    evs = [
        (
            (r["ts"] - epoch) // timedelta(microseconds=1),
            r["event_id"],
            r["user_id"],
            r["event_type"],
            r["value"],
        )
        for r in load_table(spark, SF_SMALL, "events").collect()
    ]
    day = 86_400_000_000
    by_user: dict[int, list] = {}
    for e in evs:
        by_user.setdefault(e[2], []).append(e)
    n_checked = 0
    for uid, ue in by_user.items():
        for t, eid, _, k, v in ue:
            if k != "purchase":
                continue
            prior = [x for x in ue if x[0] < t]
            exp_views = sum(1 for x in prior if x[3] == "view" and t - x[0] <= day)
            exp_clicks = sum(
                1 for x in prior if x[3] == "click" and t - x[0] <= day
            )
            exp_cv7 = sum(
                round(x[4], 6)
                for x in prior
                if x[3] == "click" and t - x[0] <= 7 * day
            )
            signups = [x[0] for x in prior if x[3] == "signup"]
            r = got[eid]
            assert r["n_views_24h"] == exp_views, eid
            assert r["n_clicks_24h"] == exp_clicks, eid
            assert abs(r["click_value_7d"] - exp_cv7) < 1e-6, eid
            if signups:
                assert r["days_since_signup"] == (t - max(signups)) // day
            else:
                assert r["days_since_signup"] is None
            n_checked += 1
    assert n_checked == len(got) > 0


def test_stream_pit_features_equals_batch(spark):
    """Feature-store/train skew guarantee: the streaming stateful PIT
    features equal the batch RANGE-frame answer on every purchase."""
    cols = (
        "event_id", "n_views_24h", "n_clicks_24h",
        "click_value_7d", "days_since_signup",
    )
    stream = {
        r["event_id"]: tuple(r[c] for c in cols)
        for r in _q("c_stream_pit_features", spark).collect()
    }
    batch = {
        r["event_id"]: tuple(r[c] for c in cols)
        for r in _q("d6_pit_features", spark).collect()
    }
    assert stream == batch and len(stream) > 0


def test_hits_normalization_and_support(spark):
    rows = _q("d2_hits_fixed", spark).collect()
    assert len(rows) > 0
    hub_sum = sum(r["hub"] for r in rows)
    auth_sum = sum(r["authority"] for r in rows)
    # each half-step sum-normalizes before the 6dp grid: totals ~ 1
    assert abs(hub_sum - 1.0) < 1e-3
    assert abs(auth_sum - 1.0) < 1e-3
    assert all(r["hub"] >= 0 and r["authority"] >= 0 for r in rows)
    # the LCG graph is near-regular but not exactly: scores must not all
    # collapse to a single value
    assert len({r["authority"] for r in rows}) > 1


def test_dynamic_partition_overwrite_counts(spark):
    rows = {r["event_type"]: r for r in _q("fmt_partition_overwrite_dynamic", spark).collect()}
    e = load_table(spark, SF_SMALL, "events")
    full = {r["event_type"]: r["n"] for r in e.groupBy("event_type").count().withColumnRenamed("count", "n").collect()}
    assert set(rows) == set(full)
    for t, r in rows.items():
        if t in ("click", "view"):
            # overwritten partitions hold only the even-id recompute
            assert r["n_events"] < full[t]
        else:
            # untouched partitions survive the dynamic overwrite intact
            assert r["n_events"] == full[t]


def test_liquidity_slope_grid_constant(spark):
    rows = _q("b47_liquidity_slope", spark).collect()
    assert len(rows) > 0
    from bigdatainvesttink_spark.operators.analytics import _DEPTH_OLS_DEN

    assert _DEPTH_OLS_DEN == 20 * sum(l * l for l in range(1, 21)) - sum(
        range(1, 21)
    ) ** 2
    for r in rows:
        assert r["n_snapshots"] > 0
        # LCG volumes are bounded by 499, so slopes are small
        assert abs(r["bid_slope"]) < 50 and abs(r["ask_slope"]) < 50


def test_cointegration_screen_invariants(spark):
    rows = _q("b48_cointegration_screen", spark).collect()
    assert 0 < len(rows) <= 25
    ranks = sorted(r["rnk"] for r in rows)
    assert ranks == list(range(1, len(rows) + 1))
    gammas = [r["gamma"] for r in rows]
    assert gammas == sorted(gammas)  # ranked by fastest mean reversion
    for r in rows:
        assert r["com_a"] < r["com_b"]
        # stationary AR(1): gamma in (-2, 0)
        assert -2.0 < r["gamma"] < 0.0
        if r["half_life_days"] is not None:
            assert r["half_life_days"] > 0


def test_rake_keywords_properties(spark):
    import pyspark.sql.functions as F

    rows = _q("d4_rake_keywords", spark).collect()
    assert len(rows) > 0
    from bigdatainvesttink_spark.functions.text import tokenize
    from bigdatainvesttink_spark.operators.textops import RAKE_N_STOPS

    d = load_table(spark, SF_SMALL, "documents").filter(F.col("text") != "")
    stop_rows = (
        d.select(F.explode(F.array_distinct(tokenize("text"))).alias("tok"))
        .groupBy("tok")
        .count()
        .collect()
    )
    stops = {
        r["tok"]
        for r in sorted(stop_rows, key=lambda r: (-r["count"], r["tok"]))[
            :RAKE_N_STOPS
        ]
    }
    texts = {r["doc_id"]: r["text"] for r in d.collect()}
    for r in rows:
        words = r["phrase"].split(" ")
        assert len(words) == r["plen"]
        # no stopword inside any extracted phrase
        assert not (set(words) & stops), r
        # the phrase occurs verbatim in the source document, bounded by
        # stopwords or document edges
        toks = [t for t in texts[r["doc_id"]].split(" ") if t != ""]
        joined = " ".join(toks)
        assert r["phrase"] in joined, r
        assert 1 <= r["rnk"] <= 3


def test_kanonymity_audit_invariants(spark):
    rows = _q("d1_kanonymity_audit", spark).collect()
    assert len(rows) > 0
    e_total = load_table(spark, SF_SMALL, "events").count()
    assert sum(r["n_rows"] for r in rows) == e_total
    for r in rows:
        assert r["n_small_classes"] <= r["n_classes"]
        assert r["rows_at_risk"] <= r["n_rows"]
        # every small class holds < k rows
        assert r["rows_at_risk"] < r["n_small_classes"] * 5 or r["n_small_classes"] == 0
        assert 0 <= r["risk_ppm"] <= 1_000_000
        assert r["min_class"] >= 1 and r["max_class"] >= r["min_class"]


def test_index_frontier_consistent_with_evals(spark):
    rows = {r["method"]: r for r in _q("d3_index_frontier", spark).collect()}
    assert set(rows) == {
        "lsh_bucket", "ivf_nprobe1", "binary_quant64", "truncate_16d",
    }
    # frontier rows must re-derive exactly from the per-method evals
    for method, qname, has_cand in (
        ("lsh_bucket", "d3_ann_recall_eval", True),
        ("ivf_nprobe1", "d3_ivf_recall_eval", True),
        ("binary_quant64", "d3_binary_quant_recall", False),
        ("truncate_16d", "d3_truncation_recall_eval", False),
    ):
        ev = _q(qname, spark).collect()
        r = rows[method]
        assert r["n_queries"] == len(ev)
        assert r["total_hits"] == sum(x["n_hits"] for x in ev)
        exp_ppm = (2 * r["total_hits"] * 1_000_000 + 5 * len(ev)) // (
            10 * len(ev)
        )
        assert r["mean_recall_ppm"] == exp_ppm
        assert 0 <= r["mean_recall_ppm"] <= 1_000_000
        if has_cand:
            assert r["avg_candidates_ppk"] > 0
        else:
            assert r["avg_candidates_ppk"] is None


def test_asof_tolerance_subsumes_b3_semantics(spark):
    import pyspark.sql.functions as F

    rows = _q("b3d_asof_tolerance", spark).collect()
    assert len(rows) > 0
    for r in rows:
        if r["in_tolerance"] == 1:
            assert r["book_ts"] is not None
            assert 0 <= r["gap_us"] <= 3600 * 1_000_000
            assert r["bid_price"] is not None and r["ask_price"] is not None
        else:
            # out-of-tolerance: ALL carried columns null together (atomic)
            assert r["book_ts"] is None and r["gap_us"] is None
            assert r["bid_price"] is None and r["ask_price"] is None
    # every trade in the slice appears exactly once (left-outer semantics)
    from bigdatainvesttink_spark.fixtures import domain_table

    n_slice = (
        domain_table(spark, SF_SMALL, "trades")
        .filter(F.col("trade_id") % 7 == 3)
        .count()
    )
    assert len(rows) == n_slice


def test_partition_quality_random_cut(spark):
    rows = _q("d2_partition_quality", spark).collect()
    assert len(rows) > 0
    total_edges = sum(r["n_out_edges"] for r in rows)
    total_cut = sum(r["n_cut"] for r in rows)
    assert 0 < total_cut <= total_edges
    for r in rows:
        assert 0 <= r["n_cut"] <= r["n_out_edges"]
        assert 0 <= r["cut_ppm"] <= 1_000_000
    # hash placement cuts roughly (P-1)/P of edges; allow a wide band
    frac = total_cut / total_edges
    assert 0.5 < frac <= 1.0


def test_bot_watchlist_matches_python_cv(spark):
    from datetime import datetime, timedelta
    from math import sqrt

    rows = _q("d6_bot_watchlist", spark).collect()
    assert 0 < len(rows) <= 10
    epoch = datetime(1970, 1, 1)
    by_user: dict[int, list] = {}
    for r in load_table(spark, SF_SMALL, "events").collect():
        us = (r["ts"] - epoch) // timedelta(microseconds=1)
        by_user.setdefault(r["user_id"], []).append((us, r["event_id"]))
    cvs = {}
    for uid, evs in by_user.items():
        evs.sort()
        gs = [
            (b[0] - a[0]) // 1_000_000 for a, b in zip(evs, evs[1:])
        ]
        if len(gs) >= 10 and sum(gs) > 0:
            n, sg, sg2 = len(gs), sum(gs), sum(g * g for g in gs)
            cvs[uid] = round(sqrt(n * sg2 - sg * sg) / sg, 6)
    expected = sorted(cvs, key=lambda u: (cvs[u], u))[:10]
    assert [r["user_id"] for r in sorted(rows, key=lambda r: r["rnk"])] == expected
    for r in rows:
        assert abs(r["gap_cv"] - cvs[r["user_id"]]) < 2e-6
        assert r["gap_cv"] >= 0


def test_filter_ablation_cube_marginals(spark):
    rows = _q("d7_filter_ablation_cube", spark).collect()
    # cube over 3 binary flags: at most (2+null)^3 rows; empty flag
    # combinations (e.g. no duplicate texts at sf0.001) simply don't appear
    assert 0 < len(rows) <= 27
    cells = {
        (r["q_pass"], r["d_keep"], r["b_clean"]): (r["n_docs"], r["total_tokens"])
        for r in rows
    }
    grand = cells[(None, None, None)]
    # marginals must re-sum exactly from the 8 base cells
    base = [
        cells[(q, d, b)]
        for q in (0, 1)
        for d in (0, 1)
        for b in (0, 1)
        if (q, d, b) in cells
    ]
    assert sum(x[0] for x in base) == grand[0]
    assert sum(x[1] for x in base) == grand[1]
    # the all-gates-on cell equals the curation pipeline's survivor volume
    surv = cells.get((1, 1, 1))
    assert surv is not None and 0 < surv[0] <= grand[0]


def test_lm_heldout_eval_bounds(spark):
    rows = _q("d4_lm_heldout_eval", spark).collect()
    assert len(rows) > 0
    for r in rows:
        # smoothed probs are in (0, 1): logprob negative, perplexity > 1
        assert r["avg_logprob"] < 0
        assert r["perplexity"] > 1.0
        assert r["n_docs"] > 0 and r["n_bigrams"] >= r["n_docs"]
        # perplexity can never exceed the smoothed-vocab upper bound and
        # the in-sample scorer (trained on everything) should on average
        # assign HIGHER probability than the held-out smoothed model
        assert r["perplexity"] < 10_000


def test_join_size_estimate_jensen_bias(spark):
    import pyspark.sql.functions as F

    rows = _q("rel_join_size_estimate", spark).collect()
    assert len(rows) > 0
    li = load_table(spark, SF_SMALL, "lineitem")
    total_actual = sum(r["actual_rows"] for r in rows)
    # the exact self-join size equals the executed join's count
    executed = (
        li.select(F.col("l_partkey").alias("k"))
        .join(li.select(F.col("l_partkey").alias("k")), "k")
        .count()
    )
    assert total_actual == executed
    for r in rows:
        # Cauchy-Schwarz: (Sum n)^2 <= ndv * Sum n^2, so the uniform
        # estimate can never exceed the exact size (integer floor aside)
        assert r["est_rows"] <= r["actual_rows"]
        assert 0 < r["est_over_actual_ppm"] <= 1_000_000


def test_contrastive_pairs_kinds(spark):
    rows = _q("d3_contrastive_pairs", spark).collect()
    assert len(rows) > 0
    kinds = {r["kind"] for r in rows}
    assert kinds <= {"positive", "hard_negative"}
    for r in rows:
        assert r["cosine"] >= 0.3
        assert r["vec_a"] < r["vec_b"]
        if r["kind"] == "positive":
            assert r["label_a"] == r["label_b"]
        else:
            assert r["label_a"] != r["label_b"]
    # ranked descending within kind
    for kind in kinds:
        ks = sorted(
            (r for r in rows if r["kind"] == kind), key=lambda r: r["rnk"]
        )
        cos = [r["cosine"] for r in ks]
        assert cos == sorted(cos, reverse=True)


def test_item_cf_recommend_excludes_held_items(spark):
    import pyspark.sql.functions as F

    rows = _q("d6_item_cf_recommend", spark).collect()
    assert len(rows) > 0
    held = {
        (r["user_id"], r["item"])
        for r in load_table(spark, SF_SMALL, "events")
        .select(
            "user_id",
            F.expr(
                "CAST(get_json_object(props, '$.k') AS INT) div 5"
            ).alias("item"),
        )
        .filter(F.col("item").isNotNull())
        .distinct()
        .collect()
    }
    per_user: dict[int, list] = {}
    for r in rows:
        # never recommend something the user already holds
        assert (r["user_id"], r["item"]) not in held, r
        assert 1 <= r["rnk"] <= 3
        per_user.setdefault(r["user_id"], []).append(r)
    for urows in per_user.values():
        urows.sort(key=lambda r: r["rnk"])
        scores = [r["score"] for r in urows]
        assert scores == sorted(scores, reverse=True)


def test_late_drop_audit_no_late_windows(spark):
    from datetime import datetime

    rows = _q("c_stream_late_drop_audit", spark).collect()
    assert len(rows) > 0
    cutoff = datetime(2024, 1, 16)
    max_seen = max(r["window_start"] for r in rows)
    for r in rows:
        # every late window (first 15 days) was dropped by the watermark
        assert r["window_start"] >= cutoff, r
        assert r["n_events"] > 0
    # the open tail (last 24h before max on-time ts) never emitted
    assert (max_seen - cutoff).days >= 1


def test_markov_absorbing_matches_python_replica(spark):
    from math import floor as _floor

    import pyspark.sql.functions as F

    rows = {
        r["event_type"]: r["p_purchase_before_error"]
        for r in _q("d6_markov_absorbing", spark).collect()
    }
    assert rows and all(0.0 <= v <= 1.0 for v in rows.values())
    # rebuild the quantized transition grid and replay the recurrence in
    # exact python ints
    e = load_table(spark, SF_SMALL, "events")
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    pairs = (
        e.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .count()
        .collect()
    )
    totals: dict[str, int] = {}
    for r in pairs:
        totals[r["src"]] = totals.get(r["src"], 0) + r["count"]
    p = {
        (r["src"], r["dst"]): _floor(r["count"] * 1_000_000 / totals[r["src"]] + 0.5)
        for r in pairs
        if r["src"] not in ("purchase", "error")
    }
    states = {s for s, _ in p}
    h = {s: 0 for s in states}
    for _ in range(12):
        nh = {}
        for s in states:
            acc = 0
            for (src, dst), pr in p.items():
                if src != s:
                    continue
                if dst == "purchase":
                    acc += pr
                elif dst == "error":
                    pass
                else:
                    acc += _floor(h.get(dst, 0) * pr / 1_000_000 + 0.5)
            nh[s] = acc
        h = nh
    for s in states:
        assert abs(rows[s] - h[s] / 1_000_000) < 1e-12, s


def test_cluster_purity_nmi_bounds(spark):
    rows = _q("d3_cluster_purity_nmi", spark).collect()
    assert len(rows) > 0
    nmis = {r["nmi"] for r in rows}
    assert len(nmis) == 1  # one global NMI repeated per cell row
    nmi = nmis.pop()
    assert 0.0 <= nmi <= 1.0 + 1e-9
    total = sum(r["n_vecs"] for r in rows)
    from bigdatainvesttink_spark.io import load_table as _lt

    assert total == _lt(spark, SF_SMALL, "embeddings").count()
    for r in rows:
        assert 0 < r["n_majority"] <= r["n_vecs"]
        # purity of a cell is at least 1/n_labels in expectation; hard
        # bound: ppm consistent with the exact ratio
        exp = (2 * r["n_majority"] * 1_000_000 + r["n_vecs"]) // (2 * r["n_vecs"])
        assert r["purity_ppm"] == exp


def test_graph_reciprocity_report_bounds(spark):
    r = _q("d2_graph_reciprocity_report", spark).collect()[0]
    assert r["n_edges"] > 0
    # follow-backs guarantee non-degenerate reciprocity; every reciprocal
    # edge is counted from both ends, so n_recip is even and <= n_edges
    assert r["n_recip"] > 0 and r["n_recip"] % 2 == 0
    assert r["n_recip"] <= r["n_edges"]
    assert 0 < r["recip_ppm"] <= 1_000_000
    assert 0 <= r["gini_ppm"] < 1_000_000
    assert r["total_deg"] == r["n_edges"]


def test_split_leakage_scan_finds_seeded_dups(spark):
    import pyspark.sql.functions as F

    rows = _q("d7_split_leakage_scan", spark).collect()
    # seeded exact copies (doc_id + 2000000) hash to DIFFERENT splits for
    # some pairs, so the scan must surface at least one leak at sf0.001+
    from bigdatainvesttink_spark.operators.dedup import corpus
    from bigdatainvesttink_spark.functions.text import stable_hash60

    c = corpus(spark, SF_SMALL)
    splits = {
        r["doc_id"]: r["s"]
        for r in c.select(
            "doc_id",
            (
                stable_hash60(
                    F.concat(F.col("doc_id").cast("string"), F.lit("|"), F.col("text"))
                )
                % 100
            ).alias("s"),
        ).collect()
    }
    for r in rows:
        # every reported pair genuinely straddles the boundary
        assert (splits[r["train_doc"]] >= 90) != (splits[r["eval_doc"]] >= 90)
        assert r["est_similarity"] >= 0.5
        # the train_doc column really is the train-side id
        assert splits[r["train_doc"]] < 90 and splits[r["eval_doc"]] >= 90


def test_ltv_cohorts_monotone_cumulative(spark):
    rows = _q("d6_ltv_cohorts", spark).collect()
    assert len(rows) > 0
    by_cohort: dict = {}
    for r in rows:
        assert r["n_active"] <= r["cohort_size"]
        assert r["week_revenue"] >= 0
        by_cohort.setdefault(r["cohort_week"], []).append(r)
    for cw, rs in by_cohort.items():
        rs.sort(key=lambda r: r["offset_week"])
        ltvs = [r["cum_ltv_per_user"] for r in rs]
        assert ltvs == sorted(ltvs), cw  # cumulative LTV never decreases


def test_var_es_tail_dominance(spark):
    # VaR/ES live in the b39_return_moments suite since the r8 registry
    # fold (COVERAGE.md group 8).
    rows = (
        _q("b39_return_moments", spark)
        .filter("var_95 IS NOT NULL")
        .collect()
    )
    assert len(rows) > 0
    for r in rows:
        # expected shortfall is at least as bad as VaR, tail is ~5%
        assert r["es_95"] <= r["var_95"] + 1e-9
        assert 0 < r["n_tail"] <= max(2, r["n_days"] // 10)


def test_tpch_refresh_moves_q1_counts(spark):
    import pyspark.sql.functions as F

    base = {
        (r["l_returnflag"], r["l_linestatus"]): r["count_order"]
        for r in _q("q1_pricing_summary", spark).collect()
    }
    refreshed = {
        (r["l_returnflag"], r["l_linestatus"]): r["count_order"]
        for r in _q("tpch_rf_refresh_q1", spark).collect()
    }
    assert set(refreshed) == set(base)
    # the refresh genuinely inserts AND deletes: totals differ from base
    assert sum(refreshed.values()) != sum(base.values())
    li = load_table(spark, SF_SMALL, "lineitem")
    kept = li.filter(
        (F.col("l_orderkey") % 7 != 3)
        & (F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
    ).count()
    ins = li.filter(
        (F.col("l_orderkey") % 13 == 5)
        & ((F.col("l_orderkey") + 3000000) % 7 != 3)
        & (F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
    ).count()
    assert sum(refreshed.values()) == kept + ins


def test_bootstrap_ci_brackets_point_estimate(spark):
    r = _q("d7_bootstrap_ci", spark).collect()[0]
    assert r["n_replicates"] == 32
    # a Poisson bootstrap CI of the mean must bracket the point estimate
    assert r["ci_lo"] <= r["point_estimate"] <= r["ci_hi"]
    assert r["ci_lo"] < r["ci_hi"]
    # interval width is sane: a few standard errors, far below the mean
    assert (r["ci_hi"] - r["ci_lo"]) < r["point_estimate"]
