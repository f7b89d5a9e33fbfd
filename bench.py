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

Methodology (round-4, VERDICT #4 pair-claim hygiene):
  * `queries_cold`: first run (file listing + footers + JIT included).
  * `queries`: WARM number — for every pruned-vs-unpruned PAIR it is the
    MEDIAN of 5 warm runs (pair claims were contradicted by min-of-2 box
    variance in r3); for unpaired queries it stays min-of-2 (cheap, and no
    cross-claim rests on them).
  * The main index uses the BUILD DEFAULT layout (impact-ordered hot
    terms) — the stopword WAND pair on it exercises the default; the
    doc-ordered control index shows what the default buys (r3's
    `*_impact_*` keys are gone: main == impact now, control == docordered).
"""
from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from planet_search_spark.indexing.build import (build_index,  # noqa: E402
                                                incremental_update)
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
    doc_dir = tempfile.mkdtemp(prefix="psearch_doc_", dir=tmp_root)
    shard_dir = tempfile.mkdtemp(prefix="psearch_shard_", dir=tmp_root)
    corpus_dir = tempfile.mkdtemp(prefix="psearch_corpus_", dir=tmp_root)
    try:
        # -- index build throughput (corpus materialized first: the build
        #    reads a table, as in production — replication isn't timed).
        #    Layout = the build DEFAULT (impact-ordered hot terms). --------
        corpus = replicated_enriched_corpus(
            spark, sf_dir, n_turns, parallelism=max(cpus * 2, 16),
            out_path=f"{corpus_dir}/tx.parquet")
        t0 = time.time()
        metrics = build_index(spark, corpus, out_dir, n_buckets=32,
                              n_groups=1, with_positions=True)
        build_sec = time.time() - t0
        timings["index_build"] = round(build_sec, 3)

        # -- segment-engine queries ----------------------------------------
        def timed(name, fn, warm: int = 2):
            # cold = first run; warm = min of 2 (unpaired) or median of 5
            # (every pruned/unpruned pair — see module docstring)
            t = time.time()
            fn()
            cold[name] = round(time.time() - t, 3)
            lat = []
            for _ in range(warm):
                t = time.time()
                fn()
                lat.append(time.time() - t)
            timings[name] = round(statistics.median(lat) if warm >= 5
                                  else min(lat), 3)

        PAIR = 5   # median-of-5 for pair claims
        timed("bm25_topk_wand", lambda: E.bm25_topk(
            spark, out_dir, "spark merge window", k=20,
            prune=True).collect(), warm=PAIR)
        timed("bm25_topk_noprune", lambda: E.bm25_topk(
            spark, out_dir, "spark merge window", k=20,
            prune=False).collect(), warm=PAIR)
        timed("bm25_topk_wand_stopword", lambda: E.bm25_topk(
            spark, out_dir, "the", k=20, prune=True).collect(), warm=PAIR)
        timed("bm25_topk_noprune_stopword", lambda: E.bm25_topk(
            spark, out_dir, "the", k=20, prune=False).collect(), warm=PAIR)
        timed("bm25_and_topk", lambda: E.bm25_topk(
            spark, out_dir, "spark merge", k=20,
            require_all=True).collect(), warm=PAIR)
        timed("dismax_multifield", lambda: E.dismax_topk(
            spark, out_dir, "spark search assistant", k=20).collect(),
            warm=PAIR)
        timed("phrase_positional", lambda: E.phrase_match(
            spark, out_dir, "stream table hash").collect())
        timed("phrase_stopword_bigram", lambda: E.phrase_match(
            spark, out_dir, "the data").collect())
        timed("phrase_prefix_positional", lambda: E.phrase_prefix_match(
            spark, out_dir, "stream table ha").collect())

        # full composition on the Spark path (round-4: the doc-values
        # split keeps stored strings above the top-k — bench it)
        p_full_spark = SearchParams(query="spark merge window",
                                    multifield=True, phrase_tiers=True,
                                    recency=True)
        timed("engine_full_search", lambda: E.search(
            spark, out_dir, p_full_spark).collect())

        # -- doc-ordered CONTROL: what the impact-default buys -------------
        # (uniform corpora give doc-ordered blocks homogeneous bounds, so
        # the stopword query cannot prune there; the main index above
        # prunes it with NO special flag — the round-3 r6 done-criterion)
        n_ctl = max(200_000, n_turns // 2)
        ctl_corpus = spark.read.parquet(f"{corpus_dir}/tx.parquet") \
            .limit(n_ctl)
        t0 = time.time()
        build_index(spark, ctl_corpus, doc_dir, n_buckets=32, n_groups=1,
                    with_positions=False, impact_order=False)
        timings["index_build_docordered"] = round(time.time() - t0, 3)
        timed("bm25_topk_wand_docordered_stopword", lambda: E.bm25_topk(
            spark, doc_dir, "the", k=20, prune=True).collect(), warm=PAIR)
        timed("bm25_topk_noprune_docordered_stopword", lambda: E.bm25_topk(
            spark, doc_dir, "the", k=20, prune=False).collect(), warm=PAIR)

        # -- clustered corpus: where block-max WAND prunes hardest ----------
        # (real ingest order clusters topics in doc-id space — see
        # transcripts.clustered_corpus; hot prefix blocks dominate θ)
        n_clu = max(200_000, n_turns // 2)
        clu = clustered_corpus(spark, n_clu, parallelism=max(cpus * 2, 16),
                               out_path=f"{corpus_dir}/clu.parquet")
        t0 = time.time()
        build_index(spark, clu, clu_dir, n_buckets=32, n_groups=1,
                    with_positions=False)
        timings["index_build_clustered"] = round(time.time() - t0, 3)
        timed("bm25_topk_wand_clustered", lambda: E.bm25_topk(
            spark, clu_dir, "hotterm", k=20, prune=True).collect(),
            warm=PAIR)
        timed("bm25_topk_noprune_clustered", lambda: E.bm25_topk(
            spark, clu_dir, "hotterm", k=20, prune=False).collect(),
            warm=PAIR)

        # serving-side WAND pairs on the clustered index: no Spark job
        # floor, so the pruning win is undiluted (decode skipped for cold
        # blocks) — bare BM25 and the round-4 dis_max WAND
        from planet_search_spark.queries.serve import LocalSearcher
        srv_clu = LocalSearcher(clu_dir)
        for name, meth, kw in [
                ("serve_wand_clustered_p50", "bm25_topk",
                 dict(prune=True)),
                ("serve_noprune_clustered_p50", "bm25_topk", {}),
                ("serve_dismax_wand_clustered_p50", "dismax_topk",
                 dict(prune=True)),
                ("serve_dismax_noprune_clustered_p50", "dismax_topk", {})]:
            fn = getattr(srv_clu, meth)
            fn("hotterm", k=20, hydrate=False, **kw)  # warm handles
            lat = []
            for _ in range(9):
                # cold posting cache each call (the pruned path never
                # caches, so a warm unpruned cache would bias the pair):
                # both sides measure fetch + decode + score per query
                srv_clu._term_cache.clear()
                t = time.time()
                fn("hotterm", k=20, hydrate=False, **kw)
                lat.append(time.time() - t)
            timings[name] = round(statistics.median(lat), 4)

        # -- low-latency serving path (no Spark jobs; same segments) --------
        srv = LocalSearcher(out_dir)

        def p50(fn, n=20):
            fn()  # warm
            lat = []
            for _ in range(n):
                t = time.time()
                fn()
                lat.append(time.time() - t)
            return round(statistics.median(lat), 4)

        srv.bm25_topk("spark", k=5)  # warm dataset handles
        timings["serve_bm25_topk_p50"] = p50(
            lambda: srv.bm25_topk("spark merge window", k=20))
        p_full = SearchParams(query="spark merge window", multifield=True,
                              phrase_tiers=True, recency=True)
        timings["serve_full_search_p50"] = p50(lambda: srv.search(p_full))
        p_exp = SearchParams(query="spark mer", prefix=True, fuzzy=False,
                             multifield=True)
        timings["serve_prefix_search_p50"] = p50(lambda: srv.search(p_exp))
        # round-6 finding: "spark mer" expands to ONE term ("merge") on the
        # enriched vocab, so the query above is really a hot-2-term dense
        # query. "merge pre" hits the designed shared-prefix family
        # (pre+3hex = 4096 terms, MAX_EXPANSIONS caps at 200) — the
        # genuine 200-expansion measurement for the expanded-dismax path.
        p_exp200 = SearchParams(query="merge pre", prefix=True, fuzzy=False,
                                multifield=True)
        timings["serve_prefix_expand200_p50"] = p50(
            lambda: srv.search(p_exp200))

        # -- sharded serving fan-out (round-3 VERDICT item 3 done-criterion:
        #    n_shards=4 vs the single searcher on the SAME 4-segment index;
        #    the build is the LSM append path, timed separately) ------------
        tx_all = spark.read.parquet(f"{corpus_dir}/tx.parquet")
        parts = [tx_all.where(F.abs(F.hash("conv_id")) % 4 == i)
                 for i in range(4)]
        t0 = time.time()
        build_index(spark, parts[0], shard_dir, n_buckets=32, n_groups=1,
                    with_positions=True)
        for p in parts[1:]:
            incremental_update(spark, shard_dir, p, n_groups=1)
        timings["index_build_4seg_lsm"] = round(time.time() - t0, 3)
        from planet_search_spark.queries.serve import ShardedSearcher
        srv_1 = LocalSearcher(shard_dir)
        srv_4 = ShardedSearcher(shard_dir, n_shards=4)
        timings["serve_full_search_1shard_p50"] = p50(
            lambda: srv_1.search(p_full))
        timings["serve_full_search_4shards_p50"] = p50(
            lambda: srv_4.search(p_full))
        timings["serve_bm25_topk_4shards_p50"] = p50(
            lambda: srv_4.bm25_topk("spark merge window", k=20))

        # -- logical (raw-table) operator suite at the sf dir ---------------
        for name in ["bm25_or", "bm25_and", "bm25_topk", "prefix_search",
                     "fuzzy_search", "function_score_search", "dismax_search"]:
            fn, _ = QUERIES[name]
            timed(f"logical_{name}", lambda fn=fn: fn(spark, sf_dir).collect())

        total = round(sum(timings.values()), 3)
        build_doc = {"n_docs": metrics["n_docs"],
                     "turns_per_sec": round(metrics["turns_per_sec"], 1),
                     "n_terms": metrics["n_terms"],
                     "postings_bytes": metrics["postings_bytes"],
                     "skew_ratio": round(metrics["skew_ratio"], 2),
                     "cpus": cpus, "n_turns_requested": n_turns}
        full_doc = {"metric": "index_build_and_query_suite_sec",
                    "value": total, "unit": "sec", "queries": timings,
                    "queries_cold": cold, "sf": sf, "build": build_doc}
        # full record to a file; the FINAL stdout line is a COMPACT headline
        # (suite total + build t/s + the claimed pairs + serving p50s) so
        # the driver's bounded tail capture always parses it — round 4's
        # full-dict line outgrew the capture and the committed artifact
        # came back "parsed": null.
        full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "BENCH_full.json")
        with open(full_path, "w") as f:
            json.dump(full_doc, f, indent=1)
        HEADLINE = [
            "index_build", "index_build_4seg_lsm",
            "bm25_topk_wand_stopword", "bm25_topk_noprune_stopword",
            "bm25_topk_wand_clustered", "bm25_topk_noprune_clustered",
            "bm25_topk_wand_docordered_stopword",
            "bm25_topk_noprune_docordered_stopword",
            "serve_wand_clustered_p50", "serve_noprune_clustered_p50",
            "serve_dismax_wand_clustered_p50",
            "serve_dismax_noprune_clustered_p50",
            "serve_bm25_topk_p50", "serve_full_search_p50",
            "serve_prefix_search_p50", "serve_prefix_expand200_p50",
            "serve_full_search_1shard_p50", "serve_full_search_4shards_p50",
        ]
        print(json.dumps(
            {"metric": "index_build_and_query_suite_sec",
             "value": total, "unit": "sec", "sf": sf,
             "queries": {k: timings[k] for k in HEADLINE if k in timings},
             "build": {"turns_per_sec": build_doc["turns_per_sec"],
                       "n_docs": build_doc["n_docs"],
                       "cpus": cpus},
             "full": "BENCH_full.json"},
            separators=(",", ":")))
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
        shutil.rmtree(clu_dir, ignore_errors=True)
        shutil.rmtree(doc_dir, ignore_errors=True)
        shutil.rmtree(shard_dir, ignore_errors=True)
        shutil.rmtree(corpus_dir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
