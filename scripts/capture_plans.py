"""Capture .explain("formatted") for declared logical queries into
plans/r07/<name>_<tag>.txt (judge deliverable: before/after plan evidence).

Usage: python3 scripts/capture_plans.py <tag> [query ...]
  tag: 'before' or 'after'
  default queries: the 7 bench-timed logical ops.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from planet_search_spark.queries.logical import QUERIES  # noqa: E402
from planet_search_spark.session import get_spark  # noqa: E402

BENCH_LOGICAL = ["bm25_or", "bm25_and", "bm25_topk", "prefix_search",
                 "fuzzy_search", "function_score_search", "dismax_search"]


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or BENCH_LOGICAL
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r07")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app="capture_plans", cores=8)
    for name in names:
        fn, _ = QUERIES[name]
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    spark.stop()


if __name__ == "__main__":
    main()
