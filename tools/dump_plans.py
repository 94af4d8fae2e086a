"""Dump .explain('formatted') for named queries to plans/r11/<q>_<tag>.txt.

Usage: python tools/dump_plans.py <tag> <query> [<query> ...]
Runs at $SPARK_GRAFT_SF_DIR (default sf0.1) so statistic-gated hints see
the same footer counts the bench does. Streaming-eager builders execute
while being built; the dumped plan is the returned frame's (pre-execution,
AQE isFinalPlan=false), same as the plan audit tests read.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bigdatainvesttink_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("dump-plans")
    qs = entrymod.queries()
    out_dir = os.path.join(REPO, "plans", "r11")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        df = getattr(df, "_lazy_plan", df)
        text = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path} ({len(text)} bytes)")
    os._exit(0)


if __name__ == "__main__":
    main()
