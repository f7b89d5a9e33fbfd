"""Focused 1M-turn index-build bench with per-stage profile (round-5
VERDICT item 1: the build-throughput regression reading needs clean
quiet-box runs with ``stage_sec`` so stage diffs vs BENCH_local_r04.json
are possible).

Replicates bench.py's build EXACTLY (same corpus materialization, same
build_index knobs, same /dev/shm temp root) but runs ONLY the build, so
nothing else contends, and emits the build's full metrics dict including
the per-stage seconds.

Usage:  python3 scripts/bench_build_only.py [out.json] [n_turns]
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from planet_search_spark.indexing.build import build_index  # noqa: E402
from planet_search_spark.session import get_spark  # noqa: E402
from planet_search_spark.transcripts import (  # noqa: E402
    replicated_enriched_corpus)


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_build_only.json"
    n_turns = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    tmp_root = os.environ.get(
        "SPARK_GRAFT_TMP",
        "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir())
    spark = get_spark(app="bench_build_only", cores=cpus,
                      shuffle_partitions=max(cpus, 32))
    out_dir = tempfile.mkdtemp(prefix="psearch_bo_idx_", dir=tmp_root)
    corpus_dir = tempfile.mkdtemp(prefix="psearch_bo_corpus_", dir=tmp_root)
    try:
        corpus = replicated_enriched_corpus(
            spark, sf_dir, n_turns, parallelism=max(cpus * 2, 16),
            out_path=f"{corpus_dir}/tx.parquet")
        t0 = time.time()
        metrics = build_index(spark, corpus, out_dir, n_buckets=32,
                              n_groups=1, with_positions=True)
        build_sec = time.time() - t0
        doc = {
            "metric": "index_build_only_sec",
            "value": round(build_sec, 3),
            "unit": "sec",
            "n_turns": n_turns,
            "cpus": cpus,
            "turns_per_sec": round(metrics["turns_per_sec"], 1),
            "n_terms": metrics["n_terms"],
            "postings_bytes": metrics["postings_bytes"],
            "skew_ratio": round(metrics["skew_ratio"], 2),
            "stage_sec": json.loads(metrics["stage_sec"])
            if isinstance(metrics.get("stage_sec"), str)
            else metrics.get("stage_sec"),
        }
        with open(out_path, "w") as f:
            json.dump(doc, f, indent=1)
        print(json.dumps(doc))
    finally:
        spark.stop()
        shutil.rmtree(out_dir, ignore_errors=True)
        shutil.rmtree(corpus_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
