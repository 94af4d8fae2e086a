"""Empirical scale validation (VERDICT r5 ask #3).

Times a list of queries at two dataset scales — the committed sf0.1 bench
fixtures and the 10x synthesis from tools/gen_scale.py — with the exact
bench.py protocol (noop sink, clearCache between runs, min of two runs,
third run on >40% disagreement), and reports the wall-time scaling factor
per query. A factor near/below 10 on 10x data is linear-or-better; a
factor well above 10 is a super-linear plan the plan audits missed.

Usage:
  python tools/gen_scale.py /tmp/scale_sf1          # once
  python tools/bench_scale.py [small] [big] [names...]
Defaults: /root/testdata/sf0.1, /tmp/scale_sf1, the round-6 list (the 10
most expensive r5 queries + every re-planned ranking/fold).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = [
    # 10 most expensive in BENCH_DETAIL.json (round 5, sf0.1, cache-cold)
    "c_stream_stream_interval_join",
    # r9: the density-capped twin — measures the join STATE machinery
    # (the headline query's output is quadratic in density by spec)
    "c_stream_interval_join_capped",
    "c_stream_neardup_flags",
    "rel_column_profile",
    "a_backfill_idempotency",
    "d3_index_frontier",
    "c_stream_pit_features",
    "c_stream_backpressure_roundtrip",
    "d2_cc_clusters",
    "d3_semantic_dedup_clusters",
    "d3_pca_project_scores",
    # every query re-planned off a single-partition global window (r5+r6)
    "d6_revenue_pareto",
    "d6_bot_watchlist",
    "d2_link_prediction_eval",
    "d6_mann_whitney",
    "d4_ks_length_drift",
]


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_sf1"
    names = sys.argv[3:] or DEFAULT_QUERIES

    import __spark_entry__ as entrymod

    from bigdatainvesttink_spark.fixtures import _CTE_ORDER, domain_table
    from bigdatainvesttink_spark.session import get_spark

    spark = get_spark("bench-scale")
    qs = entrymod.queries()

    qs["q1_pricing_summary"](spark, small).count()  # JVM/codegen warm-up

    def run_once(fn, sf_dir: str) -> float:
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        spark.catalog.clearCache()
        return dt

    def timed(fn, sf_dir: str) -> float:
        ts = [run_once(fn, sf_dir), run_once(fn, sf_dir)]
        if max(ts) > 1.4 * min(ts):
            ts.append(run_once(fn, sf_dir))
        return min(ts)

    out: dict[str, dict] = {}
    for sf_dir in (small, big):
        # ingest-once: materialize domain tables before timing (bench.py
        # protocol — query time is query work, not fixture derivation)
        for table in _CTE_ORDER:
            domain_table(spark, sf_dir, table)
    for name in names:
        fn = qs[name]
        t_small = timed(fn, small)
        t_big = timed(fn, big)
        factor = round(t_big / t_small, 2) if t_small > 0 else None
        out[name] = {
            "small_s": round(t_small, 2),
            "big_s": round(t_big, 2),
            "factor": factor,
        }
        print(f"{name}: {t_small:.2f}s -> {t_big:.2f}s  ({factor}x)")

    data_factor = int(os.environ.get("SPARK_GRAFT_SCALE_FACTOR", "10"))
    print(
        json.dumps(
            {
                "small": small,
                "big": big,
                "data_factor": data_factor,
                "queries": out,
            }
        )
    )


if __name__ == "__main__":
    main()
