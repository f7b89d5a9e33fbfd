"""CLI entry point, runnable via spark-submit (north-rule deployment shape):

    zip -r pss.zip planet_search_spark
    spark-submit --py-files pss.zip -m ...        # or:
    spark-submit --py-files pss.zip cli.py build --input <parquet> --out <dir>
    spark-submit --py-files pss.zip cli.py search --index <dir> --query "..." -k 20
    spark-submit --py-files pss.zip cli.py bench-scaling --turns 1000000

(Locally, ``python -m planet_search_spark <cmd>`` does the same.)
"""
from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession

from .indexing.build import build_index
from .queries import engine as E


def _spark() -> SparkSession:
    # Under spark-submit the session/master comes from the submit conf;
    # standalone falls back to the tuned local factory.
    from .session import get_spark
    active = SparkSession.getActiveSession()
    return active if active is not None else get_spark(app="planet-search-cli")


def main(argv: list[str] | None = None):
    p = argparse.ArgumentParser(prog="planet_search_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build an index segment")
    b.add_argument("--input", required=True,
                   help="transcripts source: parquet path OR catalog table "
                        "identifier (Iceberg) of "
                        "transcripts(conv_id,turn_idx,role,text,tool,ts)")
    b.add_argument("--format", default="auto",
                   choices=["auto", "parquet", "table", "iceberg"])
    b.add_argument("--snapshot-id", type=int, default=None,
                   help="Iceberg snapshot to index (reproducible builds)")
    b.add_argument("--out", required=True)
    b.add_argument("--buckets", type=int, default=32)
    b.add_argument("--groups", type=int, default=4)
    b.add_argument("--segment", default="seg_1")
    b.add_argument("--resume", action="store_true")
    b.add_argument("--no-positions", action="store_true")
    b.add_argument("--doc-ordered", action="store_true",
                   help="disable the impact-ordered default layout "
                        "(doc-ordered blocks; WAND then prunes only on "
                        "skewed/clustered corpora)")

    s = sub.add_parser("search", help="BM25 top-k over a built index")
    s.add_argument("--index", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("-k", type=int, default=20)
    s.add_argument("--and", dest="require_all", action="store_true")
    s.add_argument("--no-prune", action="store_true")

    fs = sub.add_parser("full-search",
                        help="full points_search composition "
                             "(expansions + function_score + filters)")
    fs.add_argument("--index", required=True)
    fs.add_argument("--query", required=True)
    fs.add_argument("-k", type=int, default=20)
    fs.add_argument("--and", dest="op_and", action="store_true")
    fs.add_argument("--prefix", action="store_true",
                    help="autocomplete: last term matches by prefix")
    fs.add_argument("--fuzzy", action="store_true")
    fs.add_argument("--exact", action="store_true")
    fs.add_argument("--multifield", action="store_true",
                    help="text x5 + meta x3 boosted fields")
    fs.add_argument("--tiers", action="store_true",
                    help="constant-score phrase tiers 12/6")
    fs.add_argument("--recency", action="store_true")
    fs.add_argument("--role", default=None)
    fs.add_argument("--tool", default=None)

    dm = sub.add_parser("dismax", help="boosted multi-field dis_max top-k")
    dm.add_argument("--index", required=True)
    dm.add_argument("--query", required=True)
    dm.add_argument("-k", type=int, default=20)

    ph = sub.add_parser("phrase", help="positional phrase match")
    ph.add_argument("--index", required=True)
    ph.add_argument("--phrase", required=True)
    ph.add_argument("--prefix", action="store_true",
                    help="last term matches by prefix (match_phrase_prefix)")

    up = sub.add_parser("update", help="append a new segment (LSM ingest), "
                                       "then compact + GC past thresholds")
    up.add_argument("--input", required=True)
    up.add_argument("--index", required=True)
    up.add_argument("--max-segments", type=int, default=4)
    up.add_argument("--gc-grace-sec", type=float, default=3600.0)

    cp = sub.add_parser("compact", help="merge all live segments into one")
    cp.add_argument("--index", required=True)
    cp.add_argument("--resume", action="store_true")

    gc = sub.add_parser("gc", help="delete non-live segment dirs past grace")
    gc.add_argument("--index", required=True)
    gc.add_argument("--grace-sec", type=float, default=3600.0)

    ut = sub.add_parser(
        "update-templates",
        help="store this build's search templates on a live index and "
             "exit, without building anything — updates the queries of a "
             "live index without a reindex (the reference's "
             "update-templates-only branch, MainClass.java:50-63); "
             "new reader opens / daemon restarts pick the config up")
    ut.add_argument("--index", required=True)
    ut.add_argument("--set", dest="sets", action="append", default=[],
                    metavar="KEY=VALUE",
                    help="override a template tunable (repeatable), e.g. "
                         "--set tier_exact=20 --set "
                         "field_boosts='{\"text\": 5, \"meta\": 1}'")

    sv = sub.add_parser("serve", help="HTTP serving daemon for one doc "
                        "shard (NO Spark: the stateless pyarrow/numpy "
                        "reader over the live segments)")
    sv.add_argument("--index", required=True)
    sv.add_argument("--host", default="127.0.0.1")
    sv.add_argument("--port", type=int, default=0,
                    help="0 = pick a free port (printed as JSON)")
    sv.add_argument("--segments", default=None,
                    help="comma-separated segment subset (a doc shard)")

    args = p.parse_args(argv)
    if args.cmd == "update-templates":   # no Spark, no index touch
        from .queries.search_config import update_templates
        overrides = {}
        for kv in args.sets:
            k, _, v = kv.partition("=")
            overrides[k.strip()] = json.loads(v)
        print(json.dumps(update_templates(args.index, overrides), indent=1))
        return
    if args.cmd == "serve":      # serving never needs a SparkSession
        from .queries.httpd import main as httpd_main
        httpd_argv = [args.index, "--host", args.host,
                      "--port", str(args.port)]
        if args.segments:
            httpd_argv += ["--segments", args.segments]
        httpd_main(httpd_argv)
        return
    spark = _spark()
    if args.cmd == "build":
        from .sources import read_transcripts
        tx = read_transcripts(spark, args.input, format=args.format,
                              snapshot_id=args.snapshot_id)
        m = build_index(spark, tx, args.out, n_buckets=args.buckets,
                        n_groups=args.groups, resume=args.resume,
                        segment=args.segment,
                        impact_order=not args.doc_ordered,
                        with_positions=not args.no_positions)
        print(json.dumps(m))
    elif args.cmd == "search":
        df = E.bm25_topk(spark, args.index, args.query, k=args.k,
                         require_all=args.require_all,
                         prune=not args.no_prune)
        for r in df.collect():
            print(json.dumps({k: str(v) for k, v in r.asDict().items()}))
    elif args.cmd == "full-search":
        from .queries.params import SearchParams
        params = SearchParams(
            query=args.query, operator="and" if args.op_and else "or",
            prefix=args.prefix, fuzzy=args.fuzzy, exact=args.exact,
            multifield=args.multifield, phrase_tiers=args.tiers,
            recency=args.recency, filter_role=args.role,
            filter_tool=args.tool, k=args.k)
        for r in E.search(spark, args.index, params).collect():
            print(json.dumps({k: str(v) for k, v in r.asDict().items()}))
    elif args.cmd == "dismax":
        for r in E.dismax_topk(spark, args.index, args.query,
                               k=args.k).collect():
            print(json.dumps({k: str(v) for k, v in r.asDict().items()}))
    elif args.cmd == "phrase":
        fn = E.phrase_prefix_match if args.prefix else E.phrase_match
        for r in fn(spark, args.index, args.phrase).collect():
            print(json.dumps(r.asDict()))
    elif args.cmd == "update":
        from .indexing.build import incremental_update, maybe_compact
        from .sources import read_transcripts
        m = incremental_update(spark, args.index,
                               read_transcripts(spark, args.input))
        c = maybe_compact(spark, args.index, max_segments=args.max_segments,
                          gc_grace_sec=args.gc_grace_sec)
        print(json.dumps({"update": m["segment"], "compact": c},
                         default=str))
    elif args.cmd == "compact":
        from .indexing.build import compact_index
        print(json.dumps(compact_index(spark, args.index,
                                       resume=args.resume), default=str))
    elif args.cmd == "gc":
        from .indexing.build import gc_segments
        print(json.dumps({"removed": gc_segments(
            args.index, grace_sec=args.grace_sec)}))


if __name__ == "__main__":
    main(sys.argv[1:])
