"""Profile the warm serving prefix query (dev tool, round-6 item 5).

Builds a 1M-turn index, warms the caches, then cProfiles N warm
`LocalSearcher.search(prefix)` calls so the per-call cost structure at
scale (fetch vs decode vs dense accumulate) is visible line-by-line.

Usage: python3 scripts/profile_prefix.py [n_turns] [query]
"""
from __future__ import annotations

import cProfile
import io
import os
import pstats
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from planet_search_spark.indexing.build import build_index  # noqa: E402
from planet_search_spark.queries.params import SearchParams  # noqa: E402
from planet_search_spark.queries.serve import LocalSearcher  # noqa: E402
from planet_search_spark.session import get_spark  # noqa: E402
from planet_search_spark.transcripts import (  # noqa: E402
    replicated_enriched_corpus)


def main():
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    query = sys.argv[2] if len(sys.argv) > 2 else "spark mer"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app="profile_prefix", cores=32)
    work = tempfile.mkdtemp(prefix="psearch_prof_", dir="/dev/shm")
    out_dir = os.path.join(work, "idx")
    try:
        corpus = replicated_enriched_corpus(
            spark, sf_dir, n_turns, parallelism=64,
            out_path=f"{work}/tx.parquet")
        build_index(spark, corpus, out_dir, n_buckets=32, n_groups=1,
                    with_positions=True)
        spark.stop()

        srv = LocalSearcher(out_dir)
        p = SearchParams(query=query, prefix=True, fuzzy=False,
                         multifield=True)
        srv.search(p)   # warm: caches postings + expansions
        t0 = time.time()
        for _ in range(5):
            srv.search(p)
        print(f"warm p50-ish: {(time.time() - t0) / 5:.4f} s/call")

        pr = cProfile.Profile()
        pr.enable()
        for _ in range(5):
            srv.search(p)
        pr.disable()
        s = io.StringIO()
        pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(30)
        print(s.getvalue())
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
