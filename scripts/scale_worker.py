"""Worker for the N-vs-4N scaling experiment: builds the index and runs the
query suite at a given parallelism, printing one JSON line.

Usage: python scripts/scale_worker.py <cores> <n_turns> [out_json]
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

from pyspark.sql import functions as F  # noqa: E402

from planet_search_spark.indexing.build import build_index  # noqa: E402
from planet_search_spark.queries import engine as E  # noqa: E402
from planet_search_spark.session import get_spark  # noqa: E402
from planet_search_spark.transcripts import transcripts_from_documents  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    cores = int(sys.argv[1])
    n_turns = int(sys.argv[2])
    out_json = sys.argv[3] if len(sys.argv) > 3 else None
    spark = get_spark(app=f"scale-{cores}", cores=cores,
                      shuffle_partitions=max(cores * 2, 16))
    tx = transcripts_from_documents(spark, SF_DIR)
    base = tx.count()
    scale = max(1, n_turns // base)
    corpus_path = os.environ.get("SPARK_GRAFT_CORPUS")
    if not corpus_path:
        corpus_path = tempfile.mkdtemp(prefix="psearch_corpus_") + "/tx.parquet"
        (tx.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(scale - 1))))
           .withColumn("conv_id", F.concat_ws("_", "conv_id", "rep"))
           .drop("rep")
           .repartition(max(cores * 2, 16))
           .write.mode("overwrite").parquet(corpus_path))
    corpus = spark.read.parquet(corpus_path)
    out_dir = tempfile.mkdtemp(prefix=f"psearch_scale_{cores}_")
    try:
        t0 = time.time()
        m = build_index(spark, corpus, out_dir, n_buckets=32, n_groups=1,
                        with_positions=True)
        build_sec = time.time() - t0
        lat = []
        for _ in range(5):
            t = time.time()
            E.bm25_topk(spark, out_dir, "spark merge window", k=20,
                        prune=False, hydrate=False).collect()
            lat.append(time.time() - t)
        res = {"cores": cores, "n_docs": m["n_docs"],
               "build_sec": round(build_sec, 2),
               "turns_per_sec": round(m["n_docs"] / build_sec, 1),
               "query_p50_sec": round(statistics.median(lat), 3),
               "stage_sec": m.get("stage_sec")}
        line = json.dumps(res)
        print(line)
        if out_json:
            with open(out_json, "w") as f:
                f.write(line)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
