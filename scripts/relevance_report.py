"""Relevance-report harness — the reference's CI relevance job made
concrete over this repo's serving stack.

The reference drives a JSON case corpus against a LIVE HTTP endpoint and,
for every miss, reports what was found instead of the expectation —
"no <expectation> in the top N, the closest was <hit> at <distance> m"
(``SearchRelevanceTest.java:95-111``, ``SearchCases.java:90-133``). This
script is that job for the transcript domain: build the 50-conversation
corpus index, start one HTTP shard daemon per live segment, drive all 425
declarative cases (``fixtures/queries.json``) through the HTTP
coordinator, and emit a pass / fail / allowed-failure report where the
reference's geo radius maps to the ts radius, so the closest-miss
distance is ``|hit.ts_epoch - expectedTsEpoch|`` seconds.

    python scripts/relevance_report.py [--out reports]

Artifacts: ``<out>/relevance_report.json`` (machine-readable, one row per
case: status, n_hits, latency_ms, failure line) and
``<out>/relevance_report.txt`` (the human summary the CI job would post).
Exit code 1 iff any non-allowFailure criterion case fails.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from planet_search_spark import analysis as A  # noqa: E402
from planet_search_spark.queries.httpd import (HttpShardedSearcher,  # noqa: E402
                                               SearchDaemon)
from planet_search_spark.queries.params import SearchParams  # noqa: E402

REPO = Path(__file__).resolve().parents[1]


def _params(case) -> SearchParams:
    # identical mapping to tests/test_search_corpus.py::_params — the
    # corpus is shared between the pytest gate and this HTTP report
    return SearchParams(
        query=case["query"],
        operator=case.get("operator", "or"),
        prefix=case.get("prefix", False),
        fuzzy=case.get("fuzzy", False),
        exact=case.get("exact", False),
        filter_role=case.get("filterRole"),
        filter_tool=case.get("filterTool"),
        recency=case.get("recency", False),
        multifield=case.get("multifield", False),
        phrase_tiers=case.get("phraseTiers", False),
        k=case.get("k", 20))


def _expectation(case) -> str:
    if case.get("expectedTarget"):
        et = case["expectedTarget"]
        return f"{et['convId']}/{et['turnIdx']}"
    if case.get("expectedExactText") is not None:
        return (f'exact "{case["expectedExactText"]}" within '
                f'{case.get("radiusSec")}s')
    return f'hit within {case.get("radiusSec")}s'


def evaluate(case, top, byid):
    """(passed, failure_line): the reference trio criterion + closest-miss
    line (``SearchCases.failure``). Distance = ts delta in seconds."""
    et = case.get("expectedTarget")
    if et and any(r["conv_id"] == et["convId"]
                  and r["turn_idx"] == et["turnIdx"] for r in top):
        return True, None
    rad, ets = case.get("radiusSec"), case.get("expectedTsEpoch")
    in_radius = [r for r in top
                 if rad is None or ets is None
                 or abs(byid[(r["conv_id"], r["turn_idx"])]["ts_epoch"]
                        - ets) <= rad]
    if case.get("expectedExactText") is not None and rad is not None:
        want_kw = A.py_keyword(case["expectedExactText"])
        if any(byid[(r["conv_id"], r["turn_idx"])]["kw"] == want_kw
               for r in in_radius):
            return True, None
    if rad is not None and ets is not None \
            and case.get("expectedExactText") is None and in_radius:
        return True, None
    # closest miss: nearest top-N hit to the expected timestamp
    found = "nothing"
    if ets is not None:
        best = None
        for r in top:
            d = abs(byid[(r["conv_id"], r["turn_idx"])]["ts_epoch"] - ets)
            if best is None or d < best[0]:
                best = (d, r)
        if best is not None:
            found = (f'"{best[1]["conv_id"]}/{best[1]["turn_idx"]}" '
                     f"at {best[0]:.0f} s")
    elif top:
        found = f'"{top[0]["conv_id"]}/{top[0]["turn_idx"]}" (top hit)'
    line = (f'{case["id"]}: "{case["query"]}" - no {_expectation(case)} '
            f'in the top {case.get("topN", len(top))}, '
            f"the closest was {found}")
    return False, line


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(REPO / "reports"))
    ap.add_argument("--shards", type=int, default=2,
                    help="HTTP shard daemons (segments split round-robin)")
    args = ap.parse_args()

    import tempfile

    from planet_search_spark.indexing.build import (build_index,
                                                    incremental_update)
    from planet_search_spark.session import get_spark
    from planet_search_spark.transcripts import synthesize_transcripts
    from pyspark.sql import functions as F

    cases = json.loads((REPO / "fixtures" / "queries.json").read_text())
    spark = get_spark(cores=8)
    tx = synthesize_transcripts(spark, n_convs=50, seed=11)
    rows = [r.asDict() for r in
            tx.withColumn("ts_epoch", F.unix_timestamp("ts"))
              .drop("ts").collect()]
    byid = {(r["conv_id"], r["turn_idx"]):
            {"ts_epoch": r["ts_epoch"], "kw": A.py_keyword(r["text"])}
            for r in rows}

    # two live segments (build + LSM append) so the coordinator really
    # fans out across shard daemons — the ES data-node topology
    half = F.crc32(F.col("conv_id")) % 2 == 0
    tmp = tempfile.mkdtemp(prefix="relevance_idx_")
    build_index(spark, tx.where(half), tmp, n_buckets=8, block_size=32,
                salt_target=128, n_groups=2)
    incremental_update(spark, tmp, tx.where(~half), n_groups=2)
    spark.stop()

    with open(os.path.join(tmp, "live.json")) as f:
        live = json.load(f)["segments"]
    shards = [live[i::args.shards] for i in range(args.shards)]
    shards = [s for s in shards if s]
    daemons = [SearchDaemon(tmp, segments=s).start() for s in shards]
    coord = HttpShardedSearcher([d.url for d in daemons])

    report, failures = [], 0
    counts = {"pass": 0, "fail": 0, "allowed-failure": 0, "no-criterion": 0}
    try:
        for case in cases:
            t0 = time.perf_counter()
            hits = coord.search(_params(case))
            ms = (time.perf_counter() - t0) * 1000.0
            row = {"id": case["id"], "query": case["query"],
                   "n_hits": len(hits), "latency_ms": round(ms, 2)}
            if any(k in case for k in ("expectedTarget",
                                       "expectedExactText", "radiusSec")):
                top = hits[:case.get("topN", len(hits))]
                ok, line = evaluate(case, top, byid)
                if case.get("allowFailure"):
                    row["status"] = "allowed-failure"
                    row["detail"] = ("currently passing" if ok else line)
                elif ok:
                    row["status"] = "pass"
                else:
                    row["status"] = "fail"
                    row["detail"] = line
                    failures += 1
            else:
                # rank-exactness for criterion-less cases is pinned by the
                # pytest corpus gate (vs the brute-force oracle); the HTTP
                # report records reachability + latency for them
                row["status"] = "no-criterion"
            counts[row["status"] if row["status"] in counts
                   else "no-criterion"] += 1
            report.append(row)
    finally:
        for d in daemons:
            d.stop()

    lat = sorted(r["latency_ms"] for r in report)
    summary = {
        "cases": len(report), **counts,
        "shards": len(daemons),
        "latency_ms_p50": lat[len(lat) // 2],
        "latency_ms_p95": lat[int(len(lat) * 0.95)],
    }
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "relevance_report.json"), "w") as f:
        json.dump({"summary": summary, "cases": report}, f, indent=1)
    lines = [f"relevance report — {len(report)} cases over "
             f"{len(daemons)} HTTP shards",
             " ".join(f"{k}={v}" for k, v in summary.items()
                      if k not in ("cases", "shards")), ""]
    for r in report:
        if r["status"] in ("fail", "allowed-failure") and "detail" in r \
                and r["detail"] != "currently passing":
            lines.append(f"[{r['status']}] {r['detail']}")
    txt = "\n".join(lines) + "\n"
    with open(os.path.join(args.out, "relevance_report.txt"), "w") as f:
        f.write(txt)
    print(txt)
    print(json.dumps(summary))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
