"""Round-7 noop-sink isolation probes (guide §1.4) — the measurements
behind OPTIMIZATION_r07.md's stage attributions. Not part of bench.py
(which is frozen for the driver); run standalone on a quiet box.

Usage: python3 scripts/bench_extra.py [n_turns]

Builds (or reuses) a corpus + one index under /dev/shm, then times:
- the tokenize chain with/without the Generate barrier (duplicate-eval
  demonstration),
- the encode pipeline piecewise (dim join / +repart+sort / +mapInArrow
  encode / identity-boundary cost),
- engine bm25_topk component costs (term stats, decode, agg, hydration).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from planet_search_spark import analysis as A  # noqa: E402
from planet_search_spark.indexing.build import (FIELDS,  # noqa: E402
                                                POSTINGS_SCHEMA,
                                                build_index)
from planet_search_spark.queries import engine as E  # noqa: E402
from planet_search_spark.session import get_spark  # noqa: E402
from planet_search_spark.transcripts import (  # noqa: E402
    replicated_enriched_corpus)


def timed(label, fn, n=2):
    fn()
    best = 1e9
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    print(f"{label:46s} {best:.3f}s", flush=True)


def main():
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark(app="bench_extra", cores=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    work = "/dev/shm/bench_extra"
    corpus_path = f"{work}/tx.parquet"
    if not os.path.exists(corpus_path):
        replicated_enriched_corpus(spark, sf_dir, n_turns,
                                   parallelism=64, out_path=corpus_path)
    tx = spark.read.parquet(corpus_path)
    idx = f"{work}/idx"
    if not os.path.exists(f"{idx}/live.json"):
        build_index(spark, tx, idx, n_buckets=32, n_groups=1,
                    with_positions=True)

    def noop(df):
        return lambda: df.write.format("noop").mode("overwrite").save()

    # --- duplicate-eval demonstration -----------------------------------
    dup = (tx.withColumn("toks", A.tokens_col(F.col("text")))
             .where(F.size("toks") > 0)
             .withColumn("dl", F.size("toks").cast("long"))
             .select("conv_id", "dl", "toks"))
    once = (tx.select("*", F.explode(F.array(A.tokens_col(F.col("text"))))
                      .alias("toks"))
              .where(F.size("toks") > 0)
              .withColumn("dl", F.size("toks").cast("long"))
              .select("conv_id", "dl", "toks"))
    for name, df in (("tokenize withColumn (3x eval)", dup),
                     ("tokenize Generate barrier (1x)", once)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        print(f"{name}: regexp_extract_all nodes ="
              f" {plan.count('regexp_extract_all')}")
        timed(name, noop(df))

    # --- encode pipeline piecewise (round-7 v4) -------------------------
    # The index is positional, so tf_partial no longer exists: the
    # SHUFFLED fallback derives tf with the same on-the-fly groupBy the
    # build uses, and the DIRECT path reads pos_partial per bucket.
    import shutil

    from planet_search_spark.indexing.build import (_encode_bucket_task_fn,
                                                    _encode_stream_fn)
    seg = f"{idx}/segments/seg_1"
    with open(f"{seg}/corpus_stats.json") as f:
        cs = json.load(f)
    field_stats = {FIELDS[k]: (float(v["n_docs"]),
                               v["sum_dl"] / v["n_docs"] if v["n_docs"]
                               else 1.0)
                   for k, v in cs["fields"].items()}
    tf_stored = (spark.read.parquet(f"{seg}/pos_partial").drop("pos")
                 .groupBy("bucket", "field", "term", "doc_id", "dl")
                 .agg(F.count("*").alias("tf")))
    term_df = spark.read.parquet(f"{seg}/term_dict") \
        .select("term", "field", "bucket", "df")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16384")
    lean = ["field", "term", "doc_id",
            F.col("dl").cast("int").alias("dl"),
            F.col("tf").cast("int").alias("tf")]
    stream = (tf_stored
              .join(term_df.drop("bucket").hint("SHUFFLE_HASH"),
                    ["field", "term"])
              .withColumn("nsalt", F.greatest(
                  F.lit(1), F.ceil(F.col("df") / F.lit(65536.0))).cast("int"))
              .withColumn("salt",
                          (F.col("doc_id") % F.col("nsalt")).cast("int"))
              .select(*lean, "df", "salt")
              .repartition(64, "field", "term", "salt"))
    timed("encode[fallback]: tf groupBy+join+repart", noop(stream))

    def ident(batches):
        for b in batches:
            yield b
    in_schema = ("field int, term string, doc_id long, "
                 "dl int, tf int, df double, salt int")

    def consume(batches):
        import pyarrow as pa
        n = 0
        for b in batches:
            n += b.num_rows
        yield pa.RecordBatch.from_arrays(
            [pa.array([n], type=pa.int64())], names=["n"])

    timed("encode[fallback]: +consume-only boundary",
          noop(stream.mapInArrow(consume, schema="n long")))
    timed("encode[fallback]: +identity round-trip boundary",
          noop(stream.mapInArrow(ident, schema=in_schema)))
    enc = _encode_stream_fn(field_stats, 128, 8, 32, 1 << 16)
    timed("encode[fallback]: +real shuffled encode",
          noop(stream.mapInArrow(enc, schema=POSTINGS_SCHEMA)))

    def run_direct():
        dst = f"{work}/probe_direct_out"
        shutil.rmtree(dst, ignore_errors=True)
        task = _encode_bucket_task_fn(
            f"{seg}/pos_partial", "pos", dst, f"{work}/probe_direct_td",
            list(range(32)), field_stats, 128, 8, 1 << 16)
        (spark.range(0, 32, 1, 32)
         .mapInArrow(task, schema="bucket int, n_blocks long").collect())

    timed("encode[direct]: per-bucket pyarrow (postings+term_dict)",
          run_direct)
    shutil.rmtree(f"{work}/probe_direct_out", ignore_errors=True)
    shutil.rmtree(f"{work}/probe_direct_td", ignore_errors=True)

    # --- engine bm25_topk components ------------------------------------
    meta = E.open_index(idx)
    terms = ["merge", "spark", "window"]
    timed("engine: term stats collect",
          lambda: E._collect_term_stats(spark, meta, terms), n=3)
    blocks = E._load_blocks(spark, meta, terms)
    stats = E._collect_term_stats(spark, meta, terms)
    dfm = E._stats_df_map(stats)
    timed("engine: decode+score",
          noop(E._scored_postings(meta, blocks, dfm)), n=3)
    timed("engine: full bm25_topk collect",
          lambda: E.bm25_topk(spark, idx, "spark merge window",
                              k=20, prune=False).collect(), n=3)
    spark.stop()


if __name__ == "__main__":
    main()
