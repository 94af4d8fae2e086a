"""Query/oracle registry.

Operator modules register (name -> builder, name -> oracle SQL) pairs via
the ``query`` decorator; ``__spark_entry__.py`` re-exports the merged dicts
for the driver. Every builder takes (spark, sf_dir) and returns a DataFrame;
every oracle is a self-contained ANSI SQL statement DuckDB runs over the
pre-registered fixture views.
"""

from __future__ import annotations

import json
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLE: dict[str, str] = {}
_QUERY_SRC: dict[str, str] = {}  # name -> repo-relative registering module


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query builder and (optionally) its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        _QUERIES[name] = fn
        _QUERY_SRC[name] = fn.__module__.replace(".", "/") + ".py"
        if oracle is not None:
            _ORACLE[name] = oracle
        return fn

    return deco


# Queries that already have a GREEN driver-correctness row. The driver
# checks registered queries in dict order with a bounded budget (50/round),
# so ``all_queries`` yields rows that still NEED a driver verdict first:
# recently-fixed queries, then everything never checked, then the
# already-green tail. The set self-maintains by scanning the driver's
# CORRECTNESS_r*.json verdict files at import time; the static names below
# are the r1 fallback in case the verdict files are absent.


def _load_driver_green() -> frozenset[str]:
    """Names with a fully green (rows+schema+hash) driver row in any round."""
    green: set[str] = set(_DRIVER_GREEN_R1)
    root = Path(__file__).resolve().parents[1]
    for path in sorted(root.glob("CORRECTNESS_r*.json")):
        try:
            rows = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, verdict in rows.items():
            if not isinstance(verdict, dict):
                continue
            if (
                verdict.get("rows_match")
                and verdict.get("schema_match")
                and verdict.get("hash_match")
            ):
                green.add(name)
    return frozenset(green)


_DRIVER_GREEN_R1: frozenset[str] = frozenset(
    {
        "b1_candles_from_trades", "b2_volatility", "b3_large_trade_impact",
        "b4_autocorr", "b5_imbalance", "b6_enrich_broadcast",
        "b8_top_volatile", "b9_sector_rollup", "b10_distinct_counts",
        "b3b_forward_price_move", "b4b_trend_slope", "d1_dedup_exact",
        "d2_neardup_jaccard", "d2_minhash_lsh", "d2_simhash",
        "d1_compact_latest", "d2_fuzzy_levenshtein", "d2_cc_clusters",
        "d4_repetition_filter", "d7_stratified_sample",
        "d7_train_val_test_split", "d5_json_props",
        "d6_session_window_native", "d6_funnel_steps", "d6_gapfill_ffill",
        "d6_retention_cohorts", "d6_event_transitions",
        "a_ingest_dispatch_counts", "a_ingest_trades_roundtrip",
        "a_quotation_projection", "dmm_binary_decode_meta",
        "dmm_frame_sample", "dmm_resize_fit", "q1_pricing_summary",
        "rel_filter_project_scalar", "rel_join_broadcast_dims",
        "rel_join_fact_fact", "rel_join_semi", "rel_join_anti",
        "rel_agg_distinct", "rel_rollup", "rel_cube", "rel_grouping_sets",
        "rel_window_topk_per_group", "rel_window_running_sum",
        # d3_kmeans_ivf_clusters had its rows-only r1 acceptance here until
        # the round-5 exact-oracle upgrade sent it back for a real hash row
    }
)

_DRIVER_GREEN: frozenset[str] = _load_driver_green()

# Queries with no DuckDB oracle BY DESIGN (approx sketches, k-means cell
# assignment): the driver records a rows-only row and can never mark them
# hash-green, so leaving them in the unchecked group would burn one slot of
# the 50/round driver budget every round forever. Once they have ANY driver
# row (rows-only counts), sort them with the verified tail.


def _load_rows_only_checked() -> frozenset[str]:
    """Oracle-less names that already have a driver rows-only verdict."""
    checked: set[str] = set()
    root = Path(__file__).resolve().parents[1]
    for path in sorted(root.glob("CORRECTNESS_r*.json")):
        try:
            rows = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, verdict in rows.items():
            if isinstance(verdict, dict) and verdict.get("err") == "no_oracle":
                checked.add(name)
    return frozenset(checked)


_ROWS_ONLY_CHECKED: frozenset[str] = _load_rows_only_checked()

# Queries whose OUTPUT SCHEMA changed after they already had a green
# driver row — their old verdicts describe a different shape, so they must
# re-enter the driver's check budget ahead of everything (overriding the
# green tail) until a fresh row lands. Round 8: the seven absorbing
# queries of the judge-signed-off b-family registry fold (COVERAGE.md
# groups 1-9) gained their folded siblings' columns.
_SCHEMA_CHANGED: tuple[str, ...] = (
    "b4_autocorr",              # + roll_spread, ljung_box columns
    "b11_ewma_price",           # + riskmetrics_vol section
    "b12_max_drawdown",         # + ulcer, underwater-spell columns
    "b22_intraday_seasonality",  # + dow_return section
    "b37_stochastic_oscillator",  # + donchian section
    "b39_return_moments",       # + var_es, sortino columns
    "b5b_depth_imbalance",      # + depth_profile section
)

# Once-red rows after a fix — must land inside the driver's check budget
# until a green row confirms the fix (then they sort with the green tail).
_FIXED_FIRST: tuple[str, ...] = (
    # round-4 dtype-hash fixes (r3 red / latent-red): CAST(SUM AS BIGINT)
    "d7_dataset_card",
    "a_quotation_loss_audit",
    "dmm_modality_stats",
    "d3_ann_recall_eval",
    "d3_ivf_recall_eval",
    "d1_dedup_stats",
    "d2_dup_ngram_coverage",
    "d3_truncation_recall_eval",
    # round-5 rows-only -> exact-oracle upgrade: needs its first real
    # hash-checked driver row
    "d3_kmeans_ivf_clusters",
    # r2 fixes (driver-green since; kept for provenance, sort green now)
    "d7_sequence_packing",
    "d6_sessionization",
    "d7_curation_pipeline",
    "dmm_audio_features",
)


# Family-balanced priority within the unchecked group: the driver's check
# budget covers ~50 queries per round, so this list decides which FAMILIES
# get their first driver rows when the unchecked set is larger than the
# budget. Names not listed keep registration order after the listed ones
# (so newly-added queries land right after this list, before the green
# tail). As rounds go green, _load_driver_green() rotates verified names
# out of the unchecked group automatically.
_UNCHECKED_PRIORITY: tuple[str, ...] = (
    # --- round-3 head: the 50 queries unchecked at round-3 start fill the
    # budget exactly (VERDICT r2 top ask: the TPC-H/rel-ext tail first);
    # round-3 session additions queue behind them for the next round. ---
    # rel-ext tail (local-pass since r1/r2, never driver-checked)
    "rel_window_range_frame", "rel_correlated_scalar_subquery",
    "rel_in_subquery_conditional_agg", "rel_approx_aggs",
    "rel_scalar_suite", "rel_datetime_suite", "rel_set_ops_all",
    "rel_unpivot",
    # TPC-H tail (16 of 22 without driver rows)
    "tpch_q2_min_cost_supplier", "tpch_q4_order_priority",
    "tpch_q6_forecast_revenue", "tpch_q7_volume_shipping",
    "tpch_q8_market_share", "tpch_q9_product_profit",
    "tpch_q11_important_stock", "tpch_q12_priority_split",
    "tpch_q13_order_distribution", "tpch_q14_promo_share",
    "tpch_q15_top_supplier", "tpch_q16_supplier_diversity",
    "tpch_q17_small_quantity", "tpch_q19_discounted_revenue",
    "tpch_q20_excess_stock", "tpch_q22_sales_opportunity",
    # streaming additions from early round 3
    "c_stream_dedup_roundtrip", "c_stream_stream_interval_join",
    "c_stream_static_enrich",
    # early-round-3 operators (analytics / warehouse / curation / eval)
    "b11_ewma_price", "b12_max_drawdown", "b13_rsi_14",
    "d1_incremental_agg_merge", "d1_table_diff_buckets",
    "d1_scd2_point_in_time", "d2_containment_pairs",
    "d2_minhash_accuracy_eval", "d7_dataset_card",
    "d6_gapfill_linear_interp", "d6_event_paths_topk", "d6_anomaly_zscore",
    "a_quotation_loss_audit", "fmt_zorder_layout",
    "fmt_bucketed_join_no_shuffle", "fmt_compact_small_files",
    "rel_interval_bin_join", "rel_salted_skew_join",
    "rel_equidepth_histogram", "dmm_modality_stats",
    "d3_ann_recall_eval", "d3_ivf_recall_eval", "d4_bigram_logprob",
    # --- interleaved round-4 additions and late-round-3 tail: both
    # families split the remaining driver budget (fixes go first via
    # _FIXED_FIRST; whatever spills rides the next round) ---
    "d4_bpe_train", "b14_bollinger", "d4_bpe_encode", "b15_macd",
    "d4_bm25_topk", "b16_market_beta", "d3_rrf_hybrid", "d4_vocab_coverage",
    "d2_kcore_peel", "d4_zipf_slope", "b44_holt_forecast",
    "d4_cms_heavy_hitters", "d1_cdc_chunk_dedup", "d1_dedup_stats",
    "d4_quality_logreg", "d2_dup_ngram_coverage",
    "rel_hierarchy_arith_rollup", "rel_gaps_islands",
    "d6_attribution_position", "dmm_phash_neardup", "d6_ab_power_analysis",
    "rel_fk_orphan_audit", "d4_langid_confusion", "d3_pq_codebook_assign",
    "d3_binary_quant_recall", "c_stream_topk_hourly", "b45_rv_signature",
    "b17_spread_stats", "d6_next_event_baseline", "b18_tick_rule_flow",
    "c_stream_fanout_sinks", "c_stream_vwap_stateful", "rel_psi_drift",
    "d7_pack_efficiency", "d3_query_routing", "d6_funnel_conversion",
    "d7_dataset_diff", "rel_linear_counting_distinct", "d6_seasonality_scan",
    "d5_json_malformed_audit", "d3_rag_corpus_report",
    "d7_curriculum_phases", "d6_attribution_window_sweep",
    "rel_partition_skew_audit", "d7_shard_balance_plan",
    "rel_delete_cascade_audit", "rel_interval_sweep", "b19_vwap_deviation",
    "d6_markov_stationary", "d6_ab_test_readout", "b24_cusum_drift",
    "b20_kyle_lambda", "d3_centroid_drift", "d2_pagerank_fixed",
    "fmt_schema_evolution", "b21_pairwise_correlation",
    "c_stream_backpressure_roundtrip", "b3c_nearest_book_snapshot",
    "rel_window_distinct_count", "rel_hierarchy_rollup",
    "d3_semantic_dedup_clusters", "d1_dedup_normalized", "d7_epoch_shuffle",
    "d6_attribution_last_touch", "d6_rfm_segments",
    "b22_intraday_seasonality",
    # closing round-4 batch
    "d4_tokenizer_fertility",
    "rel_rle_compression_audit", "d2_label_propagation",
    "b52_lead_lag_xcorr", "d1_bitemporal_asof", "fmt_rowgroup_planner",
    "d4_source_overlap_matrix", "b53_effective_spread",
    "dmm_av_sync_audit", "d7_perplexity_filter_sweep",
    "rel_wilson_ci", "d6_markov_entropy_rate",
    "d3_pq_distortion", "d1_linkage_accuracy_eval",
    "d1_ldiversity_audit", "fmt_csv_malformed_modes",
    "d3_embedding_health", "rel_join_strategy_audit",
    "d6_growth_accounting", "d4_js_divergence",
    "b54_ofi_impact", "d5_json_array_stats",
    "d2_lpa_modularity", "b55_volume_concentration",
    "c_stream_asof_enrich", "a_wire_schema_drift",
    "d7_split_balance_audit", "rel_temporal_fk_audit",
    "d6_concurrency_profile", "a_backfill_idempotency",
    "d3_stale_index_recall", "d7_effective_epochs", "d2_rich_club",
    "fmt_compression_codecs",
    "d2_link_prediction_eval", "d7_budget_curation", "d6_revenue_pareto",
    "rel_skyline_pareto", "d7_interleave_schedule",
    "d1_scd2_fact_join", "d1_retention_ttl_whatif", "d7_shuffle_quality",
)


def _load_last_checked_round() -> dict[str, int]:
    """name -> newest round with a driver row that settled it: a fully
    green row, or a rows-only row for oracle-less names (those can never
    go hash-green, so their rows-only round IS their freshness). Parsed
    ONCE at module load (ADVICE r8: _load_green_since re-globbed every
    verdict file per _driver_order call) — the staleness rank, the
    schema-change re-entry rule, and the green tail all read this map."""
    import re

    last: dict[str, int] = dict.fromkeys(_DRIVER_GREEN_R1, 1)
    root = Path(__file__).resolve().parents[1]
    for path in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, verdict in rows.items():
            if not isinstance(verdict, dict):
                continue
            if (
                verdict.get("rows_match")
                and verdict.get("schema_match")
                and verdict.get("hash_match")
            ) or verdict.get("err") == "no_oracle":
                last[name] = max(last.get(name, 0), rnd)
    return last


_LAST_CHECKED_ROUND: dict[str, int] = _load_last_checked_round()


def _load_green_since(round_no: int) -> frozenset[str]:
    """Names with a fully green (or rows-only) driver row in round >=
    ``round_no`` — a view over the cached per-name map."""
    return frozenset(
        n for n, r in _LAST_CHECKED_ROUND.items() if r >= round_no
    )


def _changed_since_round() -> dict[int, frozenset[str]]:
    """round -> repo-relative paths changed since that round's verdict
    artifact landed (VERDICT r8 ask #3: prioritize stale green rows whose
    source moved under them). Derived from git: the commit that ADDED
    CORRECTNESS_r{N}.json marks round N's check; ``git diff --name-only``
    from there to HEAD lists what the engine changed since. Best-effort —
    any git failure degrades to {} and staleness ranks on vintage alone."""
    import subprocess

    root = Path(__file__).resolve().parents[1]
    out: dict[int, frozenset[str]] = {}
    rounds = sorted(set(_LAST_CHECKED_ROUND.values()))
    for rnd in rounds:
        try:
            commit = subprocess.run(
                ["git", "log", "--diff-filter=A", "--format=%H", "-n", "1",
                 "--", f"CORRECTNESS_r{rnd:02d}.json"],
                cwd=root, capture_output=True, text=True, timeout=10,
            ).stdout.strip()
            if not commit:
                continue
            diff = subprocess.run(
                ["git", "diff", "--name-only", f"{commit}..HEAD"],
                cwd=root, capture_output=True, text=True, timeout=10,
            )
            if diff.returncode == 0:
                out[rnd] = frozenset(diff.stdout.split())
        except (OSError, subprocess.SubprocessError, ValueError):
            continue
    return out


_CHANGED_SINCE_ROUND: dict[int, frozenset[str]] | None = None


def _changed_since_round_cached() -> dict[int, frozenset[str]]:
    global _CHANGED_SINCE_ROUND
    if _CHANGED_SINCE_ROUND is None:
        _CHANGED_SINCE_ROUND = _changed_since_round()
    return _CHANGED_SINCE_ROUND


def _driver_order(names: list[str]) -> list[str]:
    # A rows-only verdict is stale once the query gains an exact oracle
    # (e.g. d3_kmeans_ivf_clusters' integer-micro upgrade): the name must
    # rotate back into the unchecked pool for a real hash-checked row.
    fresh_rows_only = {n for n in _ROWS_ONLY_CHECKED if n not in _ORACLE}
    done = _DRIVER_GREEN | fresh_rows_only
    # Schema-changed absorbers (r8 fold): pre-r8 green rows describe the
    # old shape — re-check first until a round >= 8 green row exists.
    regreen = _load_green_since(8)
    recheck = [
        n for n in _SCHEMA_CHANGED if n in names and n not in regreen
    ]
    recheck_set = set(recheck)
    fixed = [
        n for n in _FIXED_FIRST
        if n in names and n not in done and n not in recheck_set
    ]
    unchecked = [
        n for n in names
        if n not in done and n not in _FIXED_FIRST and n not in recheck_set
    ]
    rank = {n: i for i, n in enumerate(_UNCHECKED_PRIORITY)}
    unchecked.sort(key=lambda n: rank.get(n, len(rank)))  # stable sort
    # Staleness rank for the green tail (VERDICT r8 ask #3): with the
    # unchecked backlog at zero, the driver's 50/round budget should land
    # on the STALEST green rows — ~180 date from r1-r3 while the engine
    # under them was re-planned repeatedly. Sort ascending by the round of
    # the newest settling row; within a vintage, queries whose registering
    # module changed since that round's artifact commit (git-derived,
    # best-effort) go first; registration order breaks remaining ties.
    reg_rank = {n: i for i, n in enumerate(names)}
    changed = _changed_since_round_cached()

    def _staleness(n: str) -> tuple[int, int, int]:
        rnd = _LAST_CHECKED_ROUND.get(n, 0)
        src_moved = _QUERY_SRC.get(n) in changed.get(rnd, frozenset())
        return (rnd, 0 if src_moved else 1, reg_rank[n])

    green = sorted(
        (n for n in names if n in done and n not in recheck_set),
        key=_staleness,
    )
    return recheck + fixed + unchecked + green


def all_queries() -> dict[str, QueryFn]:
    _load_operator_modules()
    return {n: _QUERIES[n] for n in _driver_order(list(_QUERIES))}


def all_oracles() -> dict[str, str]:
    _load_operator_modules()
    return {n: _ORACLE[n] for n in _driver_order(list(_ORACLE))}


_loaded = False


def _load_operator_modules() -> None:
    """Import every module that registers queries (idempotent)."""
    global _loaded
    if _loaded:
        return
    from .operators import (  # noqa: F401
        analytics,
        clustering,
        compress_codec,
        curation,
        dedup,
        events_ops,
        ingestion,
        layout,
        multimodal,
        relational,
        relational_ext,
        retrieval,
        similarity,
        textops,
        tpch,
        tpch_full,
    )
    from .sources import formats  # noqa: F401
    from .streaming import pipeline, queue_source  # noqa: F401

    _loaded = True
