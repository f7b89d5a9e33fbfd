"""Interleaved serving A/B (round-6 VERDICT item 2): alternate two code
versions' LocalSearcher processes on the SAME prebuilt index, >=11
samples each of serve_bm25_topk_p50 and serve_full_search_p50, with
/proc/stat steal+busy sampling — the serving twin of
``reports/build_regression_ab_r06.json``. Each sample is a fresh process
(fresh caches), alternating A/B so box drift hits both arms equally.

Usage: python3 scripts/serve_ab.py <idx_dir> <treeA> <treeB> [n] [out.json]
(treeA/treeB: repo roots whose planet_search_spark to import)
"""
from __future__ import annotations

import json
import statistics
import subprocess
import sys
import time

WORKER = r'''
import json, statistics, sys, time
sys.path.insert(0, sys.argv[1])
from planet_search_spark.queries.serve import LocalSearcher
from planet_search_spark.queries.params import SearchParams
srv = LocalSearcher(sys.argv[2])
srv.bm25_topk("spark", k=5)
def p50(fn, n=20):
    fn()
    lat = []
    for _ in range(n):
        t = time.time(); fn(); lat.append(time.time() - t)
    return statistics.median(lat)
out = {}
out["serve_bm25_topk_p50"] = p50(lambda: srv.bm25_topk("spark merge window", k=20))
p_full = SearchParams(query="spark merge window", multifield=True,
                      phrase_tiers=True, recency=True)
out["serve_full_search_p50"] = p50(lambda: srv.search(p_full))
print(json.dumps(out))
'''


def cpu_sample():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = list(map(int, parts[1:]))
    idle = vals[3] + vals[4]
    steal = vals[7] if len(vals) > 7 else 0
    return sum(vals), idle, steal


def main():
    idx = sys.argv[1]
    tree_a, tree_b = sys.argv[2], sys.argv[3]
    n = int(sys.argv[4]) if len(sys.argv) > 4 else 11
    out_path = sys.argv[5] if len(sys.argv) > 5 else \
        "reports/serve_regression_ab_r07.json"
    samples = {"A": [], "B": []}
    for i in range(n):
        for arm, tree in (("A", tree_a), ("B", tree_b)):
            c0 = cpu_sample()
            r = subprocess.run([sys.executable, "-c", WORKER, tree, idx],
                               capture_output=True, text=True)
            c1 = cpu_sample()
            tot = max(c1[0] - c0[0], 1)
            meas = json.loads(r.stdout.strip().splitlines()[-1])
            meas["steal_pct"] = 100.0 * (c1[2] - c0[2]) / tot
            meas["busy_pct"] = 100.0 * (tot - (c1[1] - c0[1])) / tot
            samples[arm].append(meas)
            print(f"{i} {arm} {json.dumps(meas)}", flush=True)
    doc = {"metric": "serve_ab", "idx": idx,
           "trees": {"A": tree_a, "B": tree_b}, "samples": samples}
    for q in ("serve_bm25_topk_p50", "serve_full_search_p50"):
        doc[q] = {arm: {
            "median": statistics.median(s[q] for s in samples[arm]),
            "min": min(s[q] for s in samples[arm]),
            "max": max(s[q] for s in samples[arm])}
            for arm in ("A", "B")}
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({q: doc[q] for q in
                      ("serve_bm25_topk_p50", "serve_full_search_p50")}))


if __name__ == "__main__":
    main()
