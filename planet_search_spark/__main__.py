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
                   help="parquet path of transcripts(conv_id,turn_idx,role,text,tool,ts)")
    b.add_argument("--out", required=True)
    b.add_argument("--buckets", type=int, default=32)
    b.add_argument("--groups", type=int, default=4)
    b.add_argument("--segment", default="seg_1")
    b.add_argument("--resume", action="store_true")
    b.add_argument("--no-positions", action="store_true")

    s = sub.add_parser("search", help="BM25 top-k over a built index")
    s.add_argument("--index", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("-k", type=int, default=20)
    s.add_argument("--and", dest="require_all", action="store_true")
    s.add_argument("--no-prune", action="store_true")

    ph = sub.add_parser("phrase", help="positional phrase match")
    ph.add_argument("--index", required=True)
    ph.add_argument("--phrase", required=True)

    args = p.parse_args(argv)
    spark = _spark()
    if args.cmd == "build":
        tx = spark.read.parquet(args.input)
        m = build_index(spark, tx, args.out, n_buckets=args.buckets,
                        n_groups=args.groups, resume=args.resume,
                        segment=args.segment,
                        with_positions=not args.no_positions)
        print(json.dumps(m))
    elif args.cmd == "search":
        df = E.bm25_topk(spark, args.index, args.query, k=args.k,
                         require_all=args.require_all,
                         prune=not args.no_prune)
        for r in df.collect():
            print(json.dumps({k: str(v) for k, v in r.asDict().items()}))
    elif args.cmd == "phrase":
        for r in E.phrase_match(spark, args.index, args.phrase).collect():
            print(json.dumps(r.asDict()))


if __name__ == "__main__":
    main(sys.argv[1:])
