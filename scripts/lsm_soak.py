"""LSM ingestion churn soak (round-5 VERDICT item 6): one base build plus
N appends with ``maybe_compact(max_segments=4)`` + GC after every batch,
while a concurrent reader hammers the index the whole time — the
long-churn evidence behind the "LSM is the production ingestion path"
claim (the 10M result was 1 build + 3 appends; this measures read
amplification and compaction amortization over a real churn history).

Per batch it records: append wall/throughput, live-segment count before
and after (the read-amplification curve), compaction cost when triggered,
GC removals, and the serving p50 measured on a FRESH LocalSearcher (so
segment-count effects show up). The reader thread counts successful and
failed queries — any failure during churn+GC is a correctness bug (atomic
publish + retirement grace are supposed to make churn invisible).

Usage:  python3 scripts/lsm_soak.py [out.json] [n_batches] [turns_per_batch]
"""
from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from planet_search_spark.indexing.build import (build_index,  # noqa: E402
                                                gc_segments,
                                                incremental_update,
                                                maybe_compact)
from planet_search_spark.queries.serve import LocalSearcher  # noqa: E402
from planet_search_spark.session import get_spark  # noqa: E402
from planet_search_spark.transcripts import (  # noqa: E402
    replicated_enriched_corpus)

QUERIES = ["spark merge window", "error timeout", "the", "tool call",
           "upre window"]


def _n_live(out_dir: str) -> int:
    with open(os.path.join(out_dir, "live.json")) as f:
        return len(json.load(f)["segments"])


def _serving_p50(out_dir: str, n: int = 15) -> float:
    s = LocalSearcher(out_dir)   # fresh open: pays segment-count cost
    lat = []
    for i in range(n):
        t = time.time()
        s.bm25_topk(QUERIES[i % len(QUERIES)], k=10)
        lat.append(time.time() - t)
    return round(statistics.median(lat), 4)


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_lsm_soak.json"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    per_batch = int(sys.argv[3]) if len(sys.argv) > 3 else 125_000
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    tmp_root = os.environ.get(
        "SPARK_GRAFT_TMP",
        "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir())
    spark = get_spark(app="lsm_soak", cores=cpus,
                      shuffle_partitions=max(cpus, 32))
    work = tempfile.mkdtemp(prefix="psearch_soak_", dir=tmp_root)
    out_dir = os.path.join(work, "idx")
    try:
        # one deterministic corpus, split into (1 + n_batches) disjoint
        # slices by conv_id hash — every batch is a fresh set of convs,
        # appends never collide with existing doc ids
        total = per_batch * (1 + n_batches)
        corpus = replicated_enriched_corpus(
            spark, sf_dir, total, parallelism=max(cpus * 2, 16),
            out_path=f"{work}/tx.parquet")
        corpus = corpus.withColumn(
            "_b", F.pmod(F.xxhash64("conv_id"), F.lit(1 + n_batches)))
        (corpus.repartition(max(cpus, 16), "_b")
         .write.partitionBy("_b").mode("overwrite")
         .parquet(f"{work}/slices"))

        def batch_df(i: int):
            return (spark.read.parquet(f"{work}/slices/_b={i}")
                    .select("conv_id", "turn_idx", "role", "text",
                            "tool", "ts"))

        t0 = time.time()
        m0 = build_index(spark, batch_df(0), out_dir, n_buckets=32,
                         n_groups=1, with_positions=True)
        base = {"batch": 0, "kind": "base", "sec": round(time.time() - t0, 1),
                "n_docs": m0["n_docs"],
                "tps": round(m0["turns_per_sec"], 1),
                "segments_after": _n_live(out_dir),
                "p50_sec": _serving_p50(out_dir)}
        print(json.dumps(base), flush=True)

        # concurrent reader: runs for the entire churn, counting failures
        stop = threading.Event()
        reads = {"ok": 0, "fail": 0, "errs": []}

        def reader():
            while not stop.is_set():
                try:
                    s = LocalSearcher(out_dir)
                    s.bm25_topk(QUERIES[reads["ok"] % len(QUERIES)], k=10)
                    reads["ok"] += 1
                except Exception as e:   # noqa: BLE001 — count, don't die
                    reads["fail"] += 1
                    if len(reads["errs"]) < 5:
                        reads["errs"].append(repr(e))
        th = threading.Thread(target=reader, daemon=True)
        th.start()

        rows = [base]
        for i in range(1, n_batches + 1):
            segs_before = _n_live(out_dir)
            t0 = time.time()
            m = incremental_update(spark, out_dir, batch_df(i))
            append_sec = time.time() - t0
            t1 = time.time()
            cm = maybe_compact(spark, out_dir, max_segments=4,
                               gc_grace_sec=5.0)
            compact_sec = time.time() - t1
            compacted = not cm.get("skipped", False)
            gc_removed = len(cm.get("gc_removed", []) or []) if compacted \
                else len(gc_segments(out_dir, grace_sec=5.0))
            rows.append({
                "batch": i, "kind": "append",
                "sec": round(append_sec, 1),
                "n_docs": m["n_docs"],
                "tps": round(m["n_docs"] / append_sec, 1),
                "segments_before": segs_before,
                "segments_after": _n_live(out_dir),
                "compacted": compacted,
                "compact_sec": round(compact_sec, 1) if compacted else 0.0,
                "gc_removed": gc_removed,
                "p50_sec": _serving_p50(out_dir)})
            print(json.dumps(rows[-1]), flush=True)
        stop.set()
        th.join(timeout=30)

        s = LocalSearcher(out_dir)
        doc = {
            "metric": "lsm_soak_total_sec",
            "value": round(sum(r["sec"] + r.get("compact_sec", 0.0)
                               for r in rows), 1),
            "unit": "sec",
            "n_batches": n_batches, "turns_per_batch": per_batch,
            "total_docs_indexed": s.n_docs,
            "append_tps_median": round(statistics.median(
                [r["tps"] for r in rows if r["kind"] == "append"]), 1),
            "compactions": sum(1 for r in rows if r.get("compacted")),
            "compact_sec_total": round(sum(r.get("compact_sec", 0.0)
                                           for r in rows), 1),
            "max_live_segments": max(r["segments_after"] for r in rows),
            "final_live_segments": _n_live(out_dir),
            "reader": {"ok": reads["ok"], "fail": reads["fail"],
                       "errs": reads["errs"]},
            "batches": rows,
        }
        with open(out_path, "w") as f:
            json.dump(doc, f, indent=1)
        print(json.dumps({k: v for k, v in doc.items() if k != "batches"}))
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
