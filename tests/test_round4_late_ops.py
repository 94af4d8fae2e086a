"""Late round-4 operators: invariants the oracle equality can't express —
monotonicity across sweep arms, probability ranges, conservation, and
plan-shape checks."""

from __future__ import annotations

import __spark_entry__ as entrymod
from bigdatainvesttink_spark.plans.audit import plan_text
from tests.conftest import SF_SMALL


def _q(name, spark):
    return entrymod.queries()[name](spark, SF_SMALL)


def test_attribution_window_sweep_monotone(spark):
    rows = {
        r["window_h"]: r
        for r in _q("d6_attribution_window_sweep", spark).collect()
    }
    assert set(rows) == {1, 6, 24}
    # a wider lookback can only match MORE purchases and credit MORE value
    for a, b in ((1, 6), (6, 24)):
        assert rows[a]["n_matched"] <= rows[b]["n_matched"]
        assert rows[a]["credited_value"] <= rows[b]["credited_value"] + 1e-9
    # every arm prices the same purchase population
    assert len({r["n_purchases"] for r in rows.values()}) == 1


def test_position_attribution_conserves_value(spark):
    import pyspark.sql.functions as F

    from bigdatainvesttink_spark.io import load_table

    credited = (
        _q("d6_attribution_position", spark)
        .agg(F.sum("attributed_value"))
        .collect()[0][0]
    )
    e = load_table(spark, SF_SMALL, "events")
    purchases = e.filter(F.col("event_type") == "purchase")
    viewers = e.filter(F.col("event_type") == "view").select(
        "user_id"
    ).distinct()
    # total credit == total value of purchases that HAVE at least one prior
    # view, up to the documented floor-quantization residue (< 1 micro per
    # credited touch)
    touchable = (
        purchases.join(viewers, "user_id", "left_semi")
        .agg(F.sum("value"))
        .collect()[0][0]
        or 0.0
    )
    n_credits = (
        _q("d6_attribution_position", spark)
        .agg(F.sum("n_credits"))
        .collect()[0][0]
    )
    # purchases whose views are all AFTER them get no credit; allow that
    # slack downward but never credit MORE than the touchable total
    assert credited <= touchable + n_credits * 1e-6


def test_shard_balance_plan_shares(spark):
    rows = _q("d7_shard_balance_plan", spark).collect()
    assert rows
    total_share = sum(r["token_share"] for r in rows)
    assert abs(total_share - 1.0) < 1e-9
    ratios = {r["imbalance_ratio"] for r in rows}
    assert len(ratios) == 1 and min(ratios) >= 1.0


def test_seasonality_acf_bounds(spark):
    rows = _q("d6_seasonality_scan", spark).collect()
    assert rows
    for r in rows:
        assert -1.000001 <= r["acf"] <= 1.000001
    best = [r for r in rows if r["is_best"]]
    types = {r["event_type"] for r in rows}
    assert len(best) == len(types)  # exactly one best lag per type


def test_dataset_diff_statuses(spark):
    rows = _q("d7_dataset_diff", spark).collect()
    statuses = {r["status"] for r in rows}
    assert statuses <= {"added", "removed", "revised", "unchanged"}
    # v2 extends v1, so additions must exist and every 'added' row only
    # increases tokens
    assert "added" in statuses
    for r in rows:
        if r["status"] == "added":
            assert r["token_delta"] > 0
        if r["status"] == "removed":
            assert r["token_delta"] < 0


def test_rag_report_rates(spark):
    for r in _q("d3_rag_corpus_report", spark).collect():
        assert 0 <= r["dup_rate"] < 1
        assert r["n_unique_chunks"] <= r["n_chunks"]
        for c in ("chunks_with_table", "chunks_with_join",
                  "chunks_with_stream"):
            assert 0 <= r[c] <= r["n_unique_chunks"]


def test_query_routing_consistency(spark):
    rows = _q("d3_query_routing", spark).collect()
    assert rows
    for r in rows:
        assert r["route"] in ("lsh_probe", "brute_force")
        if r["route"] == "lsh_probe":
            assert 1 <= r["n_candidates"] <= 40
            assert r["expected_scored"] == r["n_candidates"]
        else:
            assert r["expected_scored"] > r["n_candidates"]


def test_psi_drift_shape(spark):
    rows = _q("rel_psi_drift", spark).collect()
    assert len(rows) == 10  # full bin grid, empty bins smoothed not dropped
    totals = {r["total_psi"] for r in rows}
    assert len(totals) == 1
    assert min(totals) >= 0.0  # PSI is a sum of (p-q)ln(p/q) >= 0 terms


def test_binary_quant_recall_range(spark):
    for r in _q("d3_binary_quant_recall", spark).collect():
        assert 0 <= r["n_hits"] <= 5
        assert abs(r["recall_at_5"] - r["n_hits"] / 5.0) < 1e-12


def test_fanout_dims_cover_both_sinks(spark):
    rows = _q("c_stream_fanout_sinks", spark).collect()
    dims = {r["dim"] for r in rows}
    assert dims == {"type", "hour"}
    n_type = sum(r["n_events"] for r in rows if r["dim"] == "type")
    n_hour = sum(r["n_events"] for r in rows if r["dim"] == "hour")
    assert n_type == n_hour  # both sinks saw the identical stream


def test_late_ops_stay_jvm_side(spark):
    for name in (
        "d6_attribution_window_sweep",
        "d7_shard_balance_plan",
        "rel_psi_drift",
        "d3_rag_corpus_report",
        "d6_seasonality_scan",
    ):
        assert "BatchEvalPython" not in plan_text(_q(name, spark)), name


def test_stopword_discovery_invariants(spark):
    rows = _q("d4_stopword_discovery", spark).collect()
    assert rows
    n_docs_implied = {round(r["doc_freq"] / r["df_ratio"]) for r in rows}
    assert len(n_docs_implied) == 1  # every ratio shares one doc count
    (n_docs,) = n_docs_implied
    for r in rows:
        assert 1 <= r["doc_freq"] <= n_docs  # df is per-doc-deduped
        assert r["is_stopword"] == (r["doc_freq"] > n_docs * 0.6)
    # the induced stop list is a strict, non-empty minority of the vocab
    n_stop = sum(r["is_stopword"] for r in rows)
    assert 0 < n_stop < len(rows)


def test_bloom_prefilter_no_false_negatives(spark):
    r = _q("d1_bloom_prefilter", spark).collect()[0]
    # Bloom filters can false-positive (priced) but NEVER false-negative
    assert r["n_missed"] == 0
    assert r["n_candidates"] == r["n_true_dups"] + r["n_false_positives"]
    assert 0 < r["n_true_dups"] < r["n_probe"]
    assert 0.0 <= r["fp_rate"] < 0.5  # 8192 bits over ~600 keys stays sparse
    # the prefilter must actually shrink the verification join
    assert r["n_candidates"] < r["n_probe"]


def test_bloom_membership_is_map_side(spark):
    text = plan_text(_q("d1_bloom_prefilter", spark))
    assert "BatchEvalPython" not in text
    assert "BroadcastNestedLoopJoin" in text  # the 1-row filter row


def test_lsh_band_sweep_s_curve(spark):
    rows = {
        r["n_bands"]: r for r in _q("d2_lsh_band_sweep", spark).collect()
    }
    assert set(rows) == {4, 8, 16}
    for r in rows.values():
        assert r["n_bands"] * r["rows_per_band"] == 32
        assert 0 <= r["n_hits"] <= min(
            r["n_candidate_pairs"], r["n_true_pairs"]
        )
    # every arm prices the same truth set
    assert len({r["n_true_pairs"] for r in rows.values()}) == 1
    # the S-curve: fewer rows per band can only ADMIT more candidates
    # (an (r=2k)-band match implies both halves match at r=k), so both
    # candidates and hits are monotone in n_bands
    for lo, hi in ((4, 8), (8, 16)):
        assert (
            rows[lo]["n_candidate_pairs"] <= rows[hi]["n_candidate_pairs"]
        )
        assert rows[lo]["n_hits"] <= rows[hi]["n_hits"]
        assert rows[lo]["pair_recall"] <= rows[hi]["pair_recall"] + 1e-12


def _micro_grid(sf_dir):
    import duckdb
    import numpy as np

    con = duckdb.connect()
    emb = con.execute(
        f"SELECT embedding FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"
    ).fetchnumpy()["embedding"]
    con.close()
    X = np.array([np.asarray(e, dtype=np.float64) for e in emb])
    Xu = np.floor(X * 1e6 + 0.5)
    n = Xu.shape[0]
    # exact integer covariance numerators: n*S_ij - S_i*S_j (object dtype
    # = python ints, so the numpy replica is exact like DECIMAL/HUGEINT)
    Xi = Xu.astype(object).astype(int)
    s = Xi.sum(axis=0)
    num = n * (Xi.T @ Xi) - np.outer(s, s)
    return num, n


def test_embedding_covariance_matches_numpy(spark):
    num, n = _micro_grid(SF_SMALL)
    rows = _q("d3_embedding_covariance", spark).collect()
    assert len(rows) == 64 * 65 // 2
    for r in rows[:200]:
        i, j = r["i"], r["j"]
        assert i <= j and r["n_vectors"] == n
        expect = float(num[i][j]) / (float(n) * float(n) * 1e12)
        assert r["cov"] == expect
    diag = {r["i"]: r for r in rows if r["i"] == r["j"]}
    assert len(diag) == 64
    for r in diag.values():
        assert r["cov"] > 0  # non-degenerate dimensions
        assert abs(r["corr"] - 1.0) < 1e-12  # sqrt(x)*sqrt(x) ~ x
    offd = [r for r in rows if r["i"] != r["j"]]
    assert all(abs(r["corr"]) <= 1.0 + 1e-12 for r in offd)


def test_pca_power_iteration_matches_numpy_replica(spark):
    import numpy as np

    num, n = _micro_grid(SF_SMALL)
    w = np.full(64, 10**6, dtype=object)
    m = None
    for _ in range(4):
        y = num @ w  # exact int matvec
        m = max(abs(v) for v in y)
        w = np.array(
            [int(np.floor(float(v) * 1e6 / float(m) + 0.5)) for v in y],
            dtype=object,
        )
    lam = float(m) / (1e6 * float(n) * float(n) * 1e12)
    rows = {r["pos"]: r for r in _q("d3_pca_power_iteration", spark).collect()}
    assert set(rows) == set(range(64))
    got_w = np.array([rows[p]["weight"] for p in range(64)])
    assert np.max(np.abs(got_w)) == 1.0  # max-norm renormalization lands on 1
    for p in range(64):
        assert rows[p]["weight"] == float(w[p]) / 1e6
        assert rows[p]["eigenvalue_est"] == lam
        assert rows[p]["n_vectors"] == n
    assert lam > 0


def test_stream_neardup_never_misses_exact_copies(spark):
    import pyspark.sql.functions as F

    from bigdatainvesttink_spark.functions.text import tokenize
    from bigdatainvesttink_spark.io import load_table

    rows = {
        r["match_kind"]: r
        for r in _q("c_stream_neardup_flags", spark).collect()
    }
    d = load_table(spark, SF_SMALL, "documents").filter(
        (F.col("text") != "") & (F.size(tokenize("text")) >= 3)
    )
    # every raw doc whose text equals a copied (%20) doc's text MUST be
    # flagged: identical text -> identical signature -> all 8 bands
    # collide (LSH has no false negatives at jaccard=1). Text-level
    # matching (not doc_id%20 alone) because the fixture also seeds
    # natural duplicate texts, which rightly collide with the copy too.
    n_copy_text_matches = (
        d.join(
            d.filter(F.col("doc_id") % 20 == 0).select("text").distinct(),
            "text",
            "left_semi",
        ).count()
    )
    assert rows["exact_copy"]["n_docs_flagged"] >= n_copy_text_matches
    assert (
        rows["exact_copy"]["n_candidate_pairs"]
        >= rows["exact_copy"]["n_docs_flagged"]
    )
    # mutated variants (one token changed) keep jaccard high: the banded
    # index must surface at least some of them at ingest
    assert rows["mutated_neardup"]["n_docs_flagged"] > 0
    for r in rows.values():
        assert r["n_candidate_pairs"] >= r["n_docs_flagged"] > 0


def test_pca_projection_matches_numpy_replica(spark):
    import duckdb
    import numpy as np

    num, n = _micro_grid(SF_SMALL)
    w = np.full(64, 10**6, dtype=object)
    for _ in range(4):
        y = num @ w
        m = max(abs(v) for v in y)
        w = np.array(
            [int(np.floor(float(v) * 1e6 / float(m) + 0.5)) for v in y],
            dtype=object,
        )
    con = duckdb.connect()
    rows_np = con.execute(
        f"SELECT label, embedding FROM '{SF_SMALL}/embeddings.parquet'"
    ).fetchall()
    con.close()
    by_label = {}
    for label, emb in rows_np:
        xu = [int(np.floor(float(x) * 1e6 + 0.5)) for x in emb]
        s = sum(int(a) * int(b) for a, b in zip(w, xu))  # exact ints
        by_label.setdefault(label, []).append(s)
    got = {r["label"]: r for r in _q("d3_pca_project_scores", spark).collect()}
    assert set(got) == set(by_label)
    for label, scores in by_label.items():
        g = got[label]
        assert g["n_vectors"] == len(scores)
        assert g["mean_score"] == float(sum(scores)) / (
            float(len(scores)) * 1e12
        )
        assert g["min_score"] == min(float(s) / 1e12 for s in scores)
        assert g["max_score"] == max(float(s) / 1e12 for s in scores)
        assert g["min_score"] <= g["mean_score"] <= g["max_score"]


def test_heaps_law_sublinear_vocab_growth(spark):
    import math

    rows = {r["prefix"]: r for r in _q("d4_heaps_law", spark).collect()}
    assert set(rows) == {"q25", "q50", "q75", "q100"}
    order = ["q25", "q50", "q75", "q100"]
    for a, b in zip(order, order[1:]):
        # prefixes nest: every count is monotone
        assert rows[a]["n_docs"] <= rows[b]["n_docs"]
        assert rows[a]["n_tokens"] <= rows[b]["n_tokens"]
        assert rows[a]["vocab"] <= rows[b]["vocab"]
        # Heaps: vocabulary grows SUB-linearly in corpus size
        assert (
            rows[b]["vocab"] * rows[a]["n_tokens"]
            <= rows[a]["vocab"] * rows[b]["n_tokens"]
        )
    for r in rows.values():
        assert 0 < r["vocab"] <= r["n_tokens"]
    # the fitted beta (log-log slope q25 -> q100) lands in Heaps range;
    # the synthetic generator's finite word list saturates V early, so 0
    # (fully saturated) is legitimate here — strictly sub-linear either way
    beta = math.log(rows["q100"]["vocab"] / rows["q25"]["vocab"]) / math.log(
        rows["q100"]["n_tokens"] / rows["q25"]["n_tokens"]
    )
    assert 0.0 <= beta < 1.0
