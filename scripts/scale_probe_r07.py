"""Round-7 scale probe (VERDICT #6/#8 follow-ups): build a 10M+-turn
index with the v4 per-bucket encoder, record per-stage seconds and
throughput, then measure the serving dense/sparse gate crossover on the
resulting single-shard index (the gate constant was 1M-tuned).

Usage: python3 scripts/scale_probe_r07.py [n_turns] [out.json] [n_buckets]
Writes the JSON artifact and prints it. Run with SPARK_DRIVER_MEM sized
for the corpus (16g for 10M turns).
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
from planet_search_spark.session import get_spark  # noqa: E402
from planet_search_spark.transcripts import (  # noqa: E402
    replicated_enriched_corpus)


def main():
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    out_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_scale_r07.json"
    n_buckets = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    tmp_root = os.environ.get(
        "SPARK_GRAFT_TMP",
        "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir())
    spark = get_spark(app="scale_probe_r07", cores=cpus,
                      shuffle_partitions=max(cpus, 32))
    work = tempfile.mkdtemp(prefix="psearch_scale_", dir=tmp_root)
    try:
        corpus = replicated_enriched_corpus(
            spark, os.environ.get("SPARK_GRAFT_SF_DIR",
                                  "/root/testdata/sf0.1"),
            n_turns, parallelism=max(cpus * 4, 64),
            out_path=f"{work}/tx.parquet")
        t0 = time.time()
        m = build_index(spark, corpus, f"{work}/idx", n_buckets=n_buckets,
                        n_groups=1, with_positions=True)
        build_sec = time.time() - t0
        doc = {
            "metric": "scale_probe_r07",
            "n_turns": n_turns,
            "n_buckets": n_buckets,
            "cpus": cpus,
            "build_sec": round(build_sec, 1),
            "turns_per_sec": round(m["turns_per_sec"], 1),
            "n_terms": m["n_terms"],
            "postings_bytes": m["postings_bytes"],
            "skew_ratio": round(m["skew_ratio"], 1),
            "stage_sec": json.loads(m["stage_sec"]),
        }
        # --- serving dense/sparse gate crossover (VERDICT #8) ----------
        from planet_search_spark.queries.serve import LocalSearcher
        srv = LocalSearcher(f"{work}/idx")
        gate = {}
        for q, label in [("spark merge window", "hot3"),
                         ("the", "stopword"),
                         ("checkpoint lineage", "mid2")]:
            srv.bm25_topk(q, k=20, hydrate=False)  # warm handles
            lat = []
            for _ in range(9):
                srv._term_cache.clear()
                t = time.time()
                srv.bm25_topk(q, k=20, hydrate=False)
                lat.append(time.time() - t)
            gate[label] = round(statistics.median(lat), 4)
        doc["serve_bm25_p50_by_query"] = gate
        with open(out_path, "w") as f:
            json.dump(doc, f, indent=1)
        print(json.dumps(doc))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
