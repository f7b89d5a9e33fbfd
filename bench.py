"""Benchmark harness: index-build throughput + query latencies.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"q1": sec, ...}, "sf": ..., "build": {...}}

Env:
  SPARK_GRAFT_SF_DIR      input dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS        local[N] (default 32)
  SPARK_GRAFT_BENCH_TURNS build corpus size (default 1,000,000 turns)
  SPARK_GRAFT_TMP         temp root (use /dev/shm to exclude disk IO)

The corpus is the deterministic documents->transcripts mapping replicated
to BENCH_TURNS with md5-derived vocabulary enrichment (fully deterministic,
no external data — see transcripts.replicated_enriched_corpus) so the build
measures real shuffle/encode throughput on a realistic term dictionary.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from planet_search_spark.indexing.build import build_index  # noqa: E402
from planet_search_spark.queries import engine as E  # noqa: E402
from planet_search_spark.queries.logical import QUERIES  # noqa: E402
from planet_search_spark.queries.params import SearchParams  # noqa: E402
from planet_search_spark.session import get_spark  # noqa: E402
from planet_search_spark.transcripts import (clustered_corpus,  # noqa: E402
                                             replicated_enriched_corpus)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_turns = int(os.environ.get("SPARK_GRAFT_BENCH_TURNS", "1000000"))
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark(app="bench", cores=cpus, shuffle_partitions=max(cpus, 32))
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    tmp_root = os.environ.get(
        "SPARK_GRAFT_TMP",
        "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir())
    out_dir = tempfile.mkdtemp(prefix="psearch_idx_", dir=tmp_root)
    clu_dir = tempfile.mkdtemp(prefix="psearch_clu_", dir=tmp_root)
    imp_dir = tempfile.mkdtemp(prefix="psearch_imp_", dir=tmp_root)
    corpus_dir = tempfile.mkdtemp(prefix="psearch_corpus_", dir=tmp_root)
    try:
        # -- index build throughput (corpus materialized first: the build
        #    reads a table, as in production — replication isn't timed) -----
        corpus = replicated_enriched_corpus(
            spark, sf_dir, n_turns, parallelism=max(cpus * 2, 16),
            out_path=f"{corpus_dir}/tx.parquet")
        t0 = time.time()
        metrics = build_index(spark, corpus, out_dir, n_buckets=32,
                              n_groups=1, with_positions=True)
        build_sec = time.time() - t0
        timings["index_build"] = round(build_sec, 3)

        # -- segment-engine queries ----------------------------------------
        def timed(name, fn):
            # both methodologies side by side (round-2 VERDICT perf note 5):
            # `cold` = the first run (file listing + footers + JIT included);
            # `queries` = min of two warm runs (at the ~2 s local-mode job
            # floor a single warm shot still carries scheduling jitter that
            # misread the pruned-vs-unpruned pairs in rounds 1-2)
            t = time.time()
            fn()
            cold[name] = round(time.time() - t, 3)
            warm = []
            for _ in range(2):
                t = time.time()
                fn()
                warm.append(time.time() - t)
            timings[name] = round(min(warm), 3)

        timed("bm25_topk_wand", lambda: E.bm25_topk(
            spark, out_dir, "spark merge window", k=20, prune=True).collect())
        timed("bm25_topk_noprune", lambda: E.bm25_topk(
            spark, out_dir, "spark merge window", k=20, prune=False).collect())
        timed("bm25_topk_wand_stopword", lambda: E.bm25_topk(
            spark, out_dir, "the", k=20, prune=True).collect())
        timed("bm25_topk_noprune_stopword", lambda: E.bm25_topk(
            spark, out_dir, "the", k=20, prune=False).collect())
        timed("bm25_and_topk", lambda: E.bm25_topk(
            spark, out_dir, "spark merge", k=20, require_all=True).collect())
        timed("dismax_multifield", lambda: E.dismax_topk(
            spark, out_dir, "spark search assistant", k=20).collect())
        timed("phrase_positional", lambda: E.phrase_match(
            spark, out_dir, "stream table hash").collect())
        timed("phrase_stopword_bigram", lambda: E.phrase_match(
            spark, out_dir, "the data").collect())
        timed("phrase_prefix_positional", lambda: E.phrase_prefix_match(
            spark, out_dir, "stream table ha").collect())

        # -- impact-ordered layout: WAND prunes on the UNIFORM corpus too ---
        # (blocks stratified by quantized impact level at build time; the
        # stopword query's low-impact blocks never decode)
        n_imp = max(200_000, n_turns // 2)
        imp_corpus = spark.read.parquet(f"{corpus_dir}/tx.parquet") \
            .limit(n_imp)
        t0 = time.time()
        build_index(spark, imp_corpus, imp_dir, n_buckets=32, n_groups=1,
                    with_positions=False, impact_order=True)
        timings["index_build_impact"] = round(time.time() - t0, 3)
        timed("bm25_topk_wand_impact_stopword", lambda: E.bm25_topk(
            spark, imp_dir, "the", k=20, prune=True).collect())
        timed("bm25_topk_noprune_impact_stopword", lambda: E.bm25_topk(
            spark, imp_dir, "the", k=20, prune=False).collect())

        # -- clustered corpus: where block-max WAND actually prunes ---------
        # (uniform corpora give doc-ordered blocks homogeneous bounds; real
        # ingest order clusters topics in doc-id space — see transcripts.
        # clustered_corpus. The stopword-shaped query df==N, but θ from the
        # hot prefix blocks exceeds every cold block's upper bound.)
        n_clu = max(200_000, n_turns // 2)
        clu = clustered_corpus(spark, n_clu, parallelism=max(cpus * 2, 16),
                               out_path=f"{corpus_dir}/clu.parquet")
        t0 = time.time()
        build_index(spark, clu, clu_dir, n_buckets=32, n_groups=1,
                    with_positions=False)
        timings["index_build_clustered"] = round(time.time() - t0, 3)
        timed("bm25_topk_wand_clustered", lambda: E.bm25_topk(
            spark, clu_dir, "hotterm", k=20, prune=True).collect())
        timed("bm25_topk_noprune_clustered", lambda: E.bm25_topk(
            spark, clu_dir, "hotterm", k=20, prune=False).collect())

        # serving-side WAND pair on the clustered index: no Spark job floor,
        # so the pruning win is undiluted (decode skipped for cold blocks)
        import statistics
        from planet_search_spark.queries.serve import LocalSearcher
        srv_clu = LocalSearcher(clu_dir)
        for name, kw in [("serve_wand_clustered_p50", dict(prune=True)),
                         ("serve_noprune_clustered_p50", {})]:
            srv_clu.bm25_topk("hotterm", k=20, hydrate=False, **kw)  # warm
            lat = []
            for _ in range(9):
                # cold posting cache each call (the pruned path never
                # caches, so a warm unpruned cache would bias the pair):
                # both sides measure fetch + decode + score per query
                srv_clu._term_cache.clear()
                t = time.time()
                srv_clu.bm25_topk("hotterm", k=20, hydrate=False, **kw)
                lat.append(time.time() - t)
            timings[name] = round(statistics.median(lat), 4)

        # low-latency serving path (no Spark jobs; same segments)
        srv = LocalSearcher(out_dir)
        srv.bm25_topk("spark", k=5)  # warm dataset handles
        lat = []
        for _ in range(20):
            t = time.time()
            srv.bm25_topk("spark merge window", k=20)
            lat.append(time.time() - t)
        timings["serve_bm25_topk_p50"] = round(statistics.median(lat), 4)
        # the FULL points_search composition on the serving path (round-3):
        # multifield boosts + phrase tiers + function_score + recency decay
        p_full = SearchParams(query="spark merge window", multifield=True,
                              phrase_tiers=True, recency=True)
        srv.search(p_full)  # warm
        lat = []
        for _ in range(20):
            t = time.time()
            srv.search(p_full)
            lat.append(time.time() - t)
        timings["serve_full_search_p50"] = round(statistics.median(lat), 4)
        p_exp = SearchParams(query="spark mer", prefix=True, fuzzy=False,
                             multifield=True)
        srv.search(p_exp)
        lat = []
        for _ in range(20):
            t = time.time()
            srv.search(p_exp)
            lat.append(time.time() - t)
        timings["serve_prefix_search_p50"] = round(statistics.median(lat), 4)

        # -- logical (raw-table) operator suite at the sf dir ---------------
        for name in ["bm25_or", "bm25_and", "bm25_topk", "prefix_search",
                     "fuzzy_search", "function_score_search", "dismax_search"]:
            fn, _ = QUERIES[name]
            timed(f"logical_{name}", lambda fn=fn: fn(spark, sf_dir).collect())

        total = round(sum(timings.values()), 3)
        print(json.dumps({
            "metric": "index_build_and_query_suite_sec",
            "value": total, "unit": "sec", "queries": timings,
            "queries_cold": cold, "sf": sf,
            "build": {"n_docs": metrics["n_docs"],
                      "turns_per_sec": round(metrics["turns_per_sec"], 1),
                      "n_terms": metrics["n_terms"],
                      "postings_bytes": metrics["postings_bytes"],
                      "skew_ratio": round(metrics["skew_ratio"], 2),
                      "cpus": cpus, "n_turns_requested": n_turns},
        }))
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
        shutil.rmtree(clu_dir, ignore_errors=True)
        shutil.rmtree(imp_dir, ignore_errors=True)
        shutil.rmtree(corpus_dir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
