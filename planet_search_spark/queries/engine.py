"""Segment query engine: BM25 top-k over the compressed posting blocks,
with optional block-max WAND pruning — all DataFrame-level.

Read path (mirrors the ES search template execution, SURVEY.md §3.2):

1. analyze the query string on the driver with the SAME frozen analyzer as
   the index side (``analysis.py_tokens`` — identity with the Spark-side
   expression is golden-tested);
2. bucket-prune + term-filter the block table (partition pruning on
   ``bucket=``, min/max row-group stats on ``term``);
3. [optional] block-max WAND prune (below);
4. Arrow-vectorized block decode (numpy varbyte) -> (term, doc_id, tf, dl);
   dl ships inside the block so scoring needs NO doc-stats join;
5. per-term BM25 column math (broadcast df join), groupBy(doc_id).sum;
6. top-k via orderBy(...).limit(k) — Spark's distributed
   TakeOrderedAndProject heap — then a broadcast hydration join against
   doc_store for the k winners only.

Block-max WAND (the Lucene-side top-k pruning the reference gets for free,
SURVEY.md §4 "Lucene-side (delegated)") as data-level pruning:

* term upper bounds ``mx(t)`` from term_dict; block bounds ``ub(t, b)``
  stored per block at build time (exact per-block max contribution).
* θ = k-th largest *partial* score over the docs of the single best block
  per term (partial ≤ true score, so θ is a valid lower bound on the k-th
  best true score).
* a block (t, b) is pruned iff ``ub(t,b) + Σ_{t'≠t} mx(t') < θ``.

Exactness argument: if a block is pruned, every doc in it has true score
< θ; any doc with true score ≥ θ therefore keeps ALL its blocks and its
computed score is exact; since ≥ k docs score ≥ θ, the true top-k and their
scores are unchanged. Docs that lost a pruned contribution rank strictly
below θ and cannot displace the top-k. Verified against the unpruned path
in tests.
"""
from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import analysis as A
from .. import scoring as S
from ..indexing import codec
from ..indexing.build import bucket_of


@dataclass
class IndexMeta:
    out_dir: str
    seg_dir: str
    n_docs: int
    avgdl: float
    n_buckets: int
    with_positions: bool


def open_index(out_dir: str) -> IndexMeta:
    with open(os.path.join(out_dir, "live.json")) as f:
        seg = json.load(f)["segment"]
    seg_dir = os.path.join(out_dir, "segments", seg)
    with open(os.path.join(seg_dir, "corpus_stats.json")) as f:
        cs = json.load(f)
    return IndexMeta(out_dir, seg_dir, cs["n_docs"], cs["avgdl"],
                     cs["n_buckets"], cs["with_positions"])


def _load_blocks(spark: SparkSession, idx: IndexMeta, terms: list[str]) -> DataFrame:
    buckets = sorted({bucket_of(t, idx.n_buckets) for t in terms})
    path = os.path.join(idx.seg_dir, "postings")
    return (spark.read.option("basePath", path).parquet(path)
            .where(F.col("bucket").isin(buckets))   # directory pruning
            .where(F.col("term").isin(list(set(terms)))))


def _term_stats(spark: SparkSession, idx: IndexMeta, terms: list[str]) -> DataFrame:
    buckets = sorted({bucket_of(t, idx.n_buckets) for t in terms})
    path = os.path.join(idx.seg_dir, "term_dict")
    return (spark.read.option("basePath", path).parquet(path)
            .where(F.col("bucket").isin(buckets))
            .where(F.col("term").isin(list(set(terms))))
            .select("term", "df", "max_score_ub"))


def _decode_blocks(blocks: DataFrame, with_positions: bool = False) -> DataFrame:
    """Arrow-batched block decode -> one row per (term, doc_id)."""
    cols = ["term", "docs_bin", "tfs_bin", "dls_bin"]
    schema = "term string, doc_id long, tf double, dl double"
    if with_positions:
        cols.append("pos_bin")
        schema += ", positions array<int>"

    def decode(batches):
        for pdf in batches:
            outs = []
            for r in pdf.itertuples(index=False):
                doc_ids = codec.delta_decode(codec.varbyte_decode(r.docs_bin))
                tfs = codec.varbyte_decode(r.tfs_bin)
                dls = codec.varbyte_decode(r.dls_bin)
                d = {"term": np.repeat(r.term, len(doc_ids)),
                     "doc_id": doc_ids,
                     "tf": tfs.astype(np.float64),
                     "dl": dls.astype(np.float64)}
                if with_positions:
                    flat = codec.decode_positions(r.pos_bin, tfs)
                    splits = np.cumsum(tfs)[:-1]
                    d["positions"] = [a.astype(np.int32) for a in
                                      np.split(flat, splits)]
                outs.append(pd.DataFrame(d))
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return blocks.select(*cols).mapInPandas(decode, schema=schema)


def _scored_postings(spark: SparkSession, idx: IndexMeta, terms: list[str],
                     blocks: DataFrame) -> DataFrame:
    """(term, doc_id, s) with exact BM25 per-term contributions."""
    decoded = _decode_blocks(blocks)
    stats = _term_stats(spark, idx, terms)
    n, avgdl = float(idx.n_docs), float(idx.avgdl)
    return (decoded.join(F.broadcast(stats.select("term", "df")), "term")
            .withColumn("s", S.bm25_term_score(
                F.col("tf"), F.col("df"), F.col("dl"),
                F.lit(n), F.lit(avgdl))))


def bm25_scores(spark: SparkSession, out_dir: str, query: str, *,
                require_all: bool = False) -> DataFrame:
    """Disjunctive/conjunctive BM25 over the segment -> (doc_id, score, nmatch)."""
    idx = open_index(out_dir)
    terms = sorted(set(A.py_tokens(query)))
    if not terms:
        return spark.range(0).select(
            F.col("id").alias("doc_id"), F.lit(0.0).alias("score"),
            F.lit(0).cast("long").alias("nmatch"))
    blocks = _load_blocks(spark, idx, terms)
    scored = _scored_postings(spark, idx, terms, blocks)
    agg = (scored.groupBy("doc_id")
           .agg(F.sum("s").alias("score"),
                F.count_distinct("term").alias("nmatch")))
    if require_all:
        agg = agg.where(F.col("nmatch") == len(terms))
    return agg


#: below this many candidate blocks the θ-sampling pass costs more than the
#: decode it saves; pruning auto-disables (results identical either way)
WAND_MIN_BLOCKS = 512


def bm25_topk(spark: SparkSession, out_dir: str, query: str, k: int = 20, *,
              require_all: bool = False, prune: bool = True,
              hydrate: bool = True) -> DataFrame:
    """Top-k BM25 with block-max WAND pruning; rank-identical to the
    unpruned path (and to the logical path) by construction."""
    idx = open_index(out_dir)
    terms = sorted(set(A.py_tokens(query)))
    if not terms:
        return spark.range(0).select(F.col("id").alias("doc_id"),
                                     F.lit(0.0).alias("score"))
    blocks = _load_blocks(spark, idx, terms)
    blocks.persist()
    try:
        if prune and blocks.count() < WAND_MIN_BLOCKS:
            prune = False
        if prune:
            stats = {r["term"]: float(r["max_score_ub"]) for r in
                     _term_stats(spark, idx, terms).collect()}
            total_ub = sum(stats.values())
            # θ: decode only the best block per term, take k-th best partial
            from pyspark.sql.window import Window
            w = Window.partitionBy("term").orderBy(F.desc("max_score"),
                                                   "block_id")
            best = (blocks.withColumn("_rn", F.row_number().over(w))
                          .where(F.col("_rn") == 1).drop("_rn"))
            sample = (_scored_postings(spark, idx, terms, best)
                      .groupBy("doc_id").agg(F.sum("s").alias("ps"))
                      .orderBy(F.desc("ps")).limit(k).collect())
            theta = float(sample[-1]["ps"]) if len(sample) >= k else 0.0
            other = {t: total_ub - ub for t, ub in stats.items()}
            other_df = spark.createDataFrame(
                [(t, o) for t, o in other.items()], "term string, other double")
            blocks_kept = (blocks.join(F.broadcast(other_df), "term")
                           .where(F.col("max_score") + F.col("other")
                                  >= F.lit(theta) - F.lit(1e-12)))
        else:
            blocks_kept = blocks
        scored = _scored_postings(spark, idx, terms, blocks_kept)
        agg = (scored.groupBy("doc_id")
               .agg(F.sum("s").alias("score"),
                    F.count_distinct("term").alias("nmatch")))
        if require_all:
            agg = agg.where(F.col("nmatch") == len(terms))
        top = (agg.orderBy(F.desc("score"), F.asc("doc_id")).limit(k))
        if hydrate:
            store = spark.read.parquet(os.path.join(idx.seg_dir, "doc_store"))
            top = (top.join(store, "doc_id")
                      .select("doc_id", "conv_id", "turn_idx", "role", "tool",
                              "ts", "score", "nmatch")
                      .orderBy(F.desc("score"), F.asc("doc_id")))
        return top
    finally:
        blocks.unpersist(False)


def phrase_match(spark: SparkSession, out_dir: str, phrase: str) -> DataFrame:
    """Positional phrase match over the segment (B11-B13 positional form).

    Returns doc_ids whose token stream contains the exact analyzed phrase.
    Strategy: decode positions for the phrase terms, then check for a
    position p with term_i at p+i for all i — vectorized numpy per doc.
    """
    idx = open_index(out_dir)
    terms = A.py_tokens(phrase)
    if not terms:
        return spark.range(0).select(F.col("id").alias("doc_id"))
    if not idx.with_positions:
        raise ValueError("index built without positions")
    uniq = sorted(set(terms))
    blocks = _load_blocks(spark, idx, uniq)
    decoded = _decode_blocks(blocks, with_positions=True)
    per_doc = (decoded.groupBy("doc_id")
               .agg(F.map_from_entries(
                   F.collect_list(F.struct("term", "positions"))).alias("tp"),
                   F.count_distinct("term").alias("nterm"))
               .where(F.col("nterm") == len(uniq)))

    terms_b = terms  # captured

    def check(batches):
        for pdf in batches:
            ok = []
            for r in pdf.itertuples(index=False):
                tp = {k: np.asarray(v, dtype=np.int64)
                      for k, v in r.tp.items()}
                cand = tp[terms_b[0]]
                for i, t in enumerate(terms_b[1:], start=1):
                    nxt = tp[t]
                    cand = cand[np.isin(cand + i, nxt)]
                    if cand.size == 0:
                        break
                ok.append(cand.size > 0)
            yield pdf.loc[ok, ["doc_id"]] if len(pdf) else pdf[["doc_id"]]

    return per_doc.mapInPandas(check, schema="doc_id long")
