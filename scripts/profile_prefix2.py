"""Dev probe: expansion counts + postings masses for the serving prefix
query at a given corpus size, plus section timings of the warm search.

Usage: python3 scripts/profile_prefix2.py [n_turns] [query]
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from planet_search_spark.indexing.build import build_index  # noqa: E402
from planet_search_spark.queries.params import SearchParams  # noqa: E402
from planet_search_spark.queries.serve import LocalSearcher  # noqa: E402
from planet_search_spark.session import get_spark  # noqa: E402
from planet_search_spark.transcripts import (  # noqa: E402
    replicated_enriched_corpus)


def main():
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 3_000_000
    query = sys.argv[2] if len(sys.argv) > 2 else "spark mer"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app="profile_prefix2", cores=32)
    work = tempfile.mkdtemp(prefix="psearch_prof2_", dir="/dev/shm")
    out_dir = os.path.join(work, "idx")
    try:
        corpus = replicated_enriched_corpus(
            spark, sf_dir, n_turns, parallelism=64,
            out_path=f"{work}/tx.parquet")
        build_index(spark, corpus, out_dir, n_buckets=32, n_groups=1,
                    with_positions=True)
        spark.stop()

        srv = LocalSearcher(out_dir)
        for q in query.split(","):
            q = q.strip()
            *exact, pfx = q.split()
            exps = srv.expand_prefix(pfx, (0, 1))
            print(f"[{q}] expansions of {pfx!r}: {len(exps)} -> "
                  f"{exps[:6]}...")
            for fid in (0, 1):
                posts = srv._postings_arrays(exact + exps, fid)
                masses = {t: v[0].size for t, v in posts.items()
                          if v[0].size}
                tot = sum(masses.values())
                big = sorted(masses.items(), key=lambda kv: -kv[1])[:4]
                print(f"[{q}] field {fid}: nonzero_terms={len(masses)} "
                      f"total_mass={tot} top={big}")
            p = SearchParams(query=q, prefix=True, fuzzy=False,
                             multifield=True)
            srv.search(p)
            lat = []
            for _ in range(9):
                t = time.time()
                srv.search(p)
                lat.append(time.time() - t)
            print(f"[{q}] warm p50: {float(np.median(lat)):.4f} s "
                  f"(n_docs={srv.n_docs})")
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
