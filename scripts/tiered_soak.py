"""Tiered-compaction soak (round-7 VERDICT item 1 done-criterion): N
equal ingest batches with ``maybe_compact`` after each; records every
compaction's wall seconds and the doc count it actually rewrote. Done =
amortized compaction cost flat in TOTAL docs (the r6 full-rewrite policy
measured 44 s at 0.5M -> 128 s at 2M total docs,
``BENCH_lsm_soak_r06.json``) while live segments stay bounded and reader
results match a single-shot build.

Usage: python3 scripts/tiered_soak.py [out.json] [n_batches] [batch_turns]
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from planet_search_spark.indexing.build import (build_index,  # noqa: E402
                                                incremental_update,
                                                maybe_compact)
from planet_search_spark.queries import engine as E  # noqa: E402
from planet_search_spark.session import get_spark  # noqa: E402
from planet_search_spark.transcripts import (  # noqa: E402
    replicated_enriched_corpus)


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_tiered_r07.json"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    batch_turns = int(sys.argv[3]) if len(sys.argv) > 3 else 100_000
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    tmp_root = os.environ.get(
        "SPARK_GRAFT_TMP",
        "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir())
    spark = get_spark(app="tiered_soak", cores=cpus)
    work = tempfile.mkdtemp(prefix="psearch_tiered_", dir=tmp_root)
    idx = os.path.join(work, "idx")
    try:
        corpus = replicated_enriched_corpus(
            spark, sf_dir, n_batches * batch_turns, parallelism=cpus * 2,
            out_path=f"{work}/tx.parquet")
        n_total = corpus.count()
        per = n_total // n_batches
        batches = [corpus.where(
            (F.abs(F.hash("conv_id", "turn_idx")) % n_batches) == i)
            for i in range(n_batches)]
        events = []
        for i, b in enumerate(batches):
            t0 = time.time()
            if i == 0:
                build_index(spark, b, idx, n_buckets=32, n_groups=1,
                            with_positions=True)
            else:
                incremental_update(spark, idx, b, n_groups=1)
            ingest_s = time.time() - t0
            t0 = time.time()
            m = maybe_compact(spark, idx, max_segments=4, n_groups=1,
                              gc_grace_sec=0.0)
            compact_s = time.time() - t0
            with open(os.path.join(idx, "live.json")) as f:
                live = json.load(f)["segments"]
            total_docs = sum(
                json.load(open(os.path.join(idx, "segments", s,
                                            "corpus_stats.json")))["n_docs"]
                for s in live)
            events.append({
                "batch": i, "ingest_sec": round(ingest_s, 2),
                "compacted": not m.get("skipped", False),
                "compact_sec": round(compact_s, 2) if not m.get(
                    "skipped", False) else None,
                "merged_docs": m.get("n_docs"),
                "n_live_segments": len(live),
                "total_docs": total_docs})
            print(json.dumps(events[-1]), flush=True)
        # reader sanity: the FULL result set equals a single-shot build of
        # the full corpus (k covers every match: doc_ids differ between
        # incremental and single-shot id assignment, so a small-k boundary
        # tie would resolve differently — compare by (conv, turn, score))
        full = os.path.join(work, "full")
        build_index(spark, corpus, full, n_buckets=32, n_groups=1,
                    with_positions=True)
        a = E.bm25_topk(spark, idx, "spark merge window",
                        k=10**7).toPandas()
        bq = E.bm25_topk(spark, full, "spark merge window",
                         k=10**7).toPandas()
        j = a.merge(bq, on=["conv_id", "turn_idx"], suffixes=("_a", "_b"),
                    how="outer", indicator=True)
        row_mismatch = int((j["_merge"] != "both").sum())
        max_delta = float((j["score_a"] - j["score_b"]).abs().max())
        doc = {"metric": "tiered_compaction_soak",
               "n_batches": n_batches, "batch_turns": per,
               "events": events,
               # per-row join, not a rounded-set compare: a 1-ulp float
               # difference crossing a fixed rounding boundary is not a
               # reader mismatch
               "reader_matches_single_shot": (row_mismatch == 0
                                              and max_delta < 1e-9),
               "reader_row_mismatches": row_mismatch,
               "reader_max_score_delta": max_delta,
               "max_live_segments": max(e["n_live_segments"]
                                        for e in events),
               "compact_secs": [e["compact_sec"] for e in events
                                if e["compacted"]]}
        with open(out_path, "w") as f:
            json.dump(doc, f, indent=1)
        print(json.dumps({k: doc[k] for k in
                          ("reader_matches_single_shot", "max_live_segments",
                           "compact_secs")}))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
