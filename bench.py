"""Benchmark harness: runs the registered query suite at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Per-query time = full plan execution to a count-style action (results are
consumed, not collected to the driver). A warm-up run of the flagship query
amortizes JVM/codegen startup out of the numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from bigdatainvesttink_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("bench")
    qs = entrymod.queries()

    # Warm-up: JVM, codegen, parquet footer caches.
    qs["q1_pricing_summary"](spark, sf_dir).count()

    def run_once(fn) -> float:
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    timings: dict[str, float] = {}
    for name, fn in qs.items():
        timings[name] = round(run_once(fn), 3)

    # The host may run other Spark jobs concurrently (driver health ticks);
    # a query that hit that window reports 10-50x its real time. Re-run
    # statistical outliers once and keep the min — bounds the extra cost to
    # the few affected queries while keeping the suite honest.
    med = sorted(timings.values())[len(timings) // 2]
    for name, t in list(timings.items()):
        if t > max(5.0, 6 * med):
            timings[name] = round(min(t, run_once(qs[name])), 3)

    total = round(sum(timings.values()), 3)
    # The driver parses the LAST stdout line and may keep only a bounded
    # tail of the output, so the result line must be (a) compact, (b) the
    # final bytes ever written to stdout. json with no whitespace plus
    # os._exit keeps py4j/JVM shutdown chatter from landing after it.
    line = json.dumps(
        {
            "metric": "suite_wall_seconds",
            "value": total,
            "unit": "sec",
            "queries": {k: round(v, 2) for k, v in timings.items()},
            "sf": sf,
        },
        separators=(",", ":"),
    )
    sys.stdout.write(line + "\n")
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
