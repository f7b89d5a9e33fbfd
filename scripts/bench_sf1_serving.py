"""Focused sf1 (10M-turn) SERVING bench — round-6 VERDICT item 5 evidence.

Round 5 measured the single-shard serving p50s at 10M docs as
bm25 1.33 s / full composition 1.79 s / prefix 2.09 s
(`BENCH_scale_r05_sf1.json`); prefix was the worst tail because the
dense path dis_max'd up to 200 expansions through a global
np.unique sort-merge. Round 6 scatters per-expansion postings straight
into doc-indexed scratch (O(total postings), `serve.py` dense path);
this script rebuilds the same 10M-turn index on round-6 code and
re-measures ONLY the serving p50s (plus the 4-shard prefix fan-out),
so the comparison is apples-to-apples without the 37-minute full suite.

Usage:  python3 scripts/bench_sf1_serving.py [out.json] [n_turns]
"""
from __future__ import annotations

import json
import os
import shutil
import statistics
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


def p50(fn, n=20):
    fn()  # warm
    lat = []
    for _ in range(n):
        t = time.time()
        fn()
        lat.append(time.time() - t)
    return round(statistics.median(lat), 4)


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_sf1_serving_r06.json"
    n_turns = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    tmp_root = os.environ.get(
        "SPARK_GRAFT_TMP",
        "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir())
    spark = get_spark(app="bench_sf1_serving", cores=cpus,
                      shuffle_partitions=max(cpus, 32))
    work = tempfile.mkdtemp(prefix="psearch_sf1srv_", dir=tmp_root)
    out_dir = os.path.join(work, "idx")
    try:
        corpus = replicated_enriched_corpus(
            spark, sf_dir, n_turns, parallelism=max(cpus * 2, 16),
            out_path=f"{work}/tx.parquet")
        t0 = time.time()
        m = build_index(spark, corpus, out_dir, n_buckets=32,
                        n_groups=1, with_positions=True)
        build_sec = time.time() - t0

        srv = LocalSearcher(out_dir)
        srv.bm25_topk("spark", k=5)  # warm dataset handles
        timings = {}
        timings["serve_bm25_topk_p50"] = p50(
            lambda: srv.bm25_topk("spark merge window", k=20))
        p_full = SearchParams(query="spark merge window", multifield=True,
                              phrase_tiers=True, recency=True)
        timings["serve_full_search_p50"] = p50(lambda: srv.search(p_full))
        p_exp = SearchParams(query="spark mer", prefix=True, fuzzy=False,
                             multifield=True)
        timings["serve_prefix_search_p50"] = p50(lambda: srv.search(p_exp))
        # a second, hotter prefix (more expansions hit more docs) so the
        # claim isn't one-query
        p_exp2 = SearchParams(query="upre win", prefix=True, fuzzy=False,
                              multifield=True)
        timings["serve_prefix_search_hot_p50"] = p50(
            lambda: srv.search(p_exp2))

        doc = {
            "metric": "sf1_serving_p50_suite_sec",
            "value": timings["serve_prefix_search_p50"],
            "unit": "sec",
            "n_turns": n_turns,
            "n_docs": m["n_docs"],
            "build_sec": round(build_sec, 1),
            "build_tps": round(m["n_docs"] / build_sec, 1),
            "queries": timings,
            "r5_reference": {"serve_bm25_topk_p50": 1.33,
                             "serve_full_search_p50": 1.79,
                             "serve_prefix_search_p50": 2.09,
                             "artifact": "BENCH_scale_r05_sf1.json"},
        }
        with open(out_path, "w") as f:
            json.dump(doc, f, indent=1)
        print(json.dumps({k: v for k, v in doc.items()}))
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
