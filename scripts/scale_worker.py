"""Worker for the N-vs-4N scaling experiment: builds the index and runs the
query suite at a given parallelism, printing one JSON line.

Usage:
  python scripts/scale_worker.py <cores>      <n_turns> [out_json]   # local[N]
  python scripts/scale_worker.py lc:<W>x<C>   <n_turns> [out_json]   # local-cluster[W,C]

``lc:4x8`` runs 4 executor JVMs x 8 cores — the shape the north rule's
"N to 4N executors" criterion describes (separate heaps/GC like a real
cluster, unlike single-JVM local[N]).

The corpus is the deterministic documents->transcripts mapping, replicated
to ``n_turns`` with distinct conv_ids and ENRICHED with md5-derived pseudo
tokens (5 unique-ish + 1 shared-prefix mid-frequency per turn) so the
vocabulary scales with the corpus like real transcripts — the raw mapping
alone has only ~31 distinct terms, which under-exercises the term-parallel
stages. Fully deterministic; no external data.
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

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from planet_search_spark.indexing.build import build_index  # noqa: E402
from planet_search_spark.queries import engine as E  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def make_spark(spec: str, total_cores: int) -> SparkSession:
    if spec.startswith("lc:"):
        w, c = spec[3:].split("x")
        mem_mb = int(os.environ.get("SPARK_GRAFT_EXEC_MB", "12288"))
        master = f"local-cluster[{w},{c},{mem_mb}]"
    else:
        master = f"local[{spec}]"
    os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/spark-local")
    spark = (SparkSession.builder.master(master)
            .appName(f"scale-{spec}")
            .config("spark.sql.shuffle.partitions",
                    os.environ.get("SPARK_GRAFT_SHUFFLE", "64"))
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.adaptive.coalescePartitions.enabled",
                    os.environ.get("SPARK_GRAFT_COALESCE", "false"))
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .config("spark.local.dir", "/dev/shm/spark-local")
            .config("spark.driver.memory",
                    os.environ.get("SPARK_DRIVER_MEM", "8g"))
            # v2 committer: task-side renames only — the v1 job-commit walks
            # every dynamic partition dir serially on the driver
            .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
            .config("spark.ui.enabled", "false")
            .getOrCreate())
    if spec.startswith("lc:"):
        # executors are separate JVM/Python processes: ship the package the
        # way a real cluster does (spark-submit --py-files)
        import zipfile
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        zpath = "/tmp/pss_worker.zip"
        with zipfile.ZipFile(zpath, "w") as z:
            pkg = os.path.join(repo, "planet_search_spark")
            for dp, _, fns in os.walk(pkg):
                for fn in fns:
                    if fn.endswith(".py"):
                        full = os.path.join(dp, fn)
                        z.write(full, os.path.relpath(full, repo))
        spark.sparkContext.addPyFile(zpath)
    return spark


def enriched_corpus(spark: SparkSession, n_turns: int, cores: int) -> str:
    """Materialize the deterministic enriched corpus; returns parquet path."""
    from planet_search_spark.transcripts import replicated_enriched_corpus
    corpus_path = os.environ.get("SPARK_GRAFT_CORPUS")
    if corpus_path:
        return corpus_path
    corpus_path = tempfile.mkdtemp(prefix="psearch_corpus_") + "/tx.parquet"
    replicated_enriched_corpus(spark, SF_DIR, n_turns,
                               parallelism=max(cores * 2, 16),
                               out_path=corpus_path)
    return corpus_path


def main():
    spec = sys.argv[1]
    n_turns = int(sys.argv[2])
    out_json = sys.argv[3] if len(sys.argv) > 3 else None
    if spec.startswith("lc:"):
        w, c = spec[3:].split("x")
        total_cores = int(w) * int(c)
    else:
        total_cores = int(spec)
    spark = make_spark(spec, total_cores)
    corpus_path = enriched_corpus(spark, n_turns, total_cores)
    corpus = spark.read.parquet(corpus_path)
    out_dir = tempfile.mkdtemp(prefix=f"psearch_scale_")
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
        res = {"spec": spec, "total_cores": total_cores,
               "n_docs": m["n_docs"],
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
