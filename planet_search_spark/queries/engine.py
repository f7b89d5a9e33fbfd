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
SURVEY.md §4 "Lucene-side (delegated)") as data-level pruning, METADATA-ONLY
(one tiny collect of per-block stats; no posting decode, no extra jobs):

* per block both bounds are recomputed under GLOBAL corpus stats from the
  stored (max_tf, min_dl) / (min_tf, max_dl) pairs — so they stay valid
  after multi-segment appends; global df(t) = Σ n_docs over t's blocks.
* θ = scan blocks by descending lower bound until cumulative n_docs ≥ k:
  every doc of a scanned block truly scores ≥ its block's lower bound, so
  θ is a valid lower bound on the k-th best total score.
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
    """Multi-segment index (the Lucene-segment model): global BM25 stats
    are exact because df / N / sum_dl are additive across segments."""
    out_dir: str
    seg_dirs: list
    n_docs: int          # global N = sum over segments
    avgdl: float         # global: sum(sum_dl) / sum(n_docs), exact int sums
    n_buckets: int
    with_positions: bool

    @property
    def seg_dir(self) -> str:  # single-segment convenience (tests, hydration)
        return self.seg_dirs[0]


def open_index(out_dir: str) -> IndexMeta:
    with open(os.path.join(out_dir, "live.json")) as f:
        segs = json.load(f)["segments"]
    seg_dirs, n_docs, sum_dl = [], 0, 0
    n_buckets = with_positions = None
    for seg in segs:
        seg_dir = os.path.join(out_dir, "segments", seg)
        with open(os.path.join(seg_dir, "corpus_stats.json")) as f:
            cs = json.load(f)
        seg_dirs.append(seg_dir)
        n_docs += cs["n_docs"]
        sum_dl += cs.get("sum_dl", int(round(cs["avgdl"] * cs["n_docs"])))
        if n_buckets is not None and cs["n_buckets"] != n_buckets:
            raise ValueError("segments disagree on n_buckets")
        n_buckets = cs["n_buckets"]
        with_positions = cs["with_positions"] if with_positions is None \
            else (with_positions and cs["with_positions"])
    return IndexMeta(out_dir, seg_dirs, n_docs, sum_dl / n_docs,
                     n_buckets, with_positions)


def _union_read(spark: SparkSession, idx: IndexMeta, sub: str) -> DataFrame:
    dfs = []
    for seg_dir in idx.seg_dirs:
        path = os.path.join(seg_dir, sub)
        dfs.append(spark.read.option("basePath", path).parquet(path))
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def doc_store(spark: SparkSession, idx: IndexMeta) -> DataFrame:
    return _union_read(spark, idx, "doc_store")


def _load_blocks(spark: SparkSession, idx: IndexMeta, terms: list[str]) -> DataFrame:
    buckets = sorted({bucket_of(t, idx.n_buckets) for t in terms})
    return (_union_read(spark, idx, "postings")
            .where(F.col("bucket").isin(buckets))   # directory pruning
            .where(F.col("term").isin(list(set(terms)))))


def _term_stats(spark: SparkSession, idx: IndexMeta, terms: list[str]) -> DataFrame:
    """Global per-term stats: df summed across segments; the WAND term
    upper bound recomputed from per-segment (max_tf, min_dl) under the
    GLOBAL (N, avgdl) — (max_tf, min_dl) dominates any real (tf, dl), so
    the bound stays valid after appends."""
    buckets = sorted({bucket_of(t, idx.n_buckets) for t in terms})
    td = (_union_read(spark, idx, "term_dict")
          .where(F.col("bucket").isin(buckets))
          .where(F.col("term").isin(list(set(terms)))))
    agg = td.groupBy("term").agg(F.sum("df").alias("df"),
                                 F.max("max_tf").alias("max_tf"),
                                 F.min("min_dl").alias("min_dl"))
    ub = S.bm25_term_score(F.col("max_tf"), F.col("df"), F.col("min_dl"),
                           F.lit(float(idx.n_docs)), F.lit(float(idx.avgdl)))
    return agg.select("term", "df", ub.alias("max_score_ub"))


def _decode_blocks(blocks: DataFrame) -> DataFrame:
    """Arrow-batched block decode -> one row per (term, doc_id)."""

    def decode(batches):
        for pdf in batches:
            outs = []
            for r in pdf.itertuples(index=False):
                doc_ids = codec.delta_decode(codec.varbyte_decode(r.docs_bin))
                outs.append(pd.DataFrame({
                    "term": np.repeat(r.term, len(doc_ids)),
                    "doc_id": doc_ids,
                    "tf": codec.varbyte_decode(r.tfs_bin).astype(np.float64),
                    "dl": codec.varbyte_decode(r.dls_bin).astype(np.float64)}))
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return (blocks.select("term", "docs_bin", "tfs_bin", "dls_bin")
            .mapInPandas(decode,
                         schema="term string, doc_id long, tf double, dl double"))


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


def bm25_topk(spark: SparkSession, out_dir: str, query: str, k: int = 20, *,
              require_all: bool = False, prune: bool = True,
              hydrate: bool = True) -> DataFrame:
    """Top-k BM25 with metadata-only block-max WAND pruning; rank-identical
    to the unpruned path (and to the logical path) by construction.

    The θ lower bound comes from block METADATA alone (one tiny collect of
    per-block stats — no posting decode): every doc in block b of term t
    scores at least lb(t,b) = bm25(min_tf, max_dl | global stats), so
    scanning blocks by descending lb until cumulative n_docs >= k yields a
    valid lower bound on the k-th best total score. A block is pruned iff
    ub(t,b) + Σ_{t'≠t} mx(t') < θ; see the module docstring for the
    exactness argument.
    """
    idx = open_index(out_dir)
    terms = sorted(set(A.py_tokens(query)))
    if not terms:
        return spark.range(0).select(F.col("id").alias("doc_id"),
                                     F.lit(0.0).alias("score"))
    blocks = _load_blocks(spark, idx, terms)
    blocks.persist()
    try:
        if prune:
            meta = blocks.select("term", "block_id", "n_docs",
                                 "max_tf", "min_dl", "min_tf", "max_dl"
                                 ).toPandas()
            if len(meta):
                n, avgdl = float(idx.n_docs), float(idx.avgdl)
                k1, b = S.K1, S.B
                # global df per term = Σ n_docs over its blocks
                df_map = meta.groupby("term")["n_docs"].sum().astype(float)
                dfv = meta["term"].map(df_map).to_numpy()
                idf = np.log(1.0 + (n - dfv + 0.5) / (dfv + 0.5))
                ub = idf * meta["max_tf"].to_numpy() / (
                    meta["max_tf"].to_numpy()
                    + k1 * (1 - b + b * meta["min_dl"].to_numpy() / avgdl))
                lb = idf * meta["min_tf"].to_numpy() / (
                    meta["min_tf"].to_numpy()
                    + k1 * (1 - b + b * meta["max_dl"].to_numpy() / avgdl))
                # θ: blocks by descending lower bound until k docs covered
                order = np.argsort(-lb)
                cum = np.cumsum(meta["n_docs"].to_numpy()[order])
                pos = int(np.searchsorted(cum, k))
                theta = float(lb[order[min(pos, len(order) - 1)]]) \
                    if cum[-1] >= k else 0.0
                mx = {}
                for t, u in zip(meta["term"], ub):
                    mx[t] = max(mx.get(t, 0.0), float(u))
                total_ub = sum(mx.values())
                other = meta["term"].map(
                    {t: total_ub - v for t, v in mx.items()}).to_numpy()
                keep = (ub + other) >= theta - 1e-12
                if keep.all():
                    blocks_kept = blocks
                else:
                    kept_df = spark.createDataFrame(
                        meta.loc[keep, ["term", "block_id"]])
                    blocks_kept = blocks.join(F.broadcast(kept_df),
                                              ["term", "block_id"])
            else:
                blocks_kept = blocks
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
            store = doc_store(spark, idx)
            top = (top.join(store, "doc_id")
                      .select("doc_id", "conv_id", "turn_idx", "role", "tool",
                              "ts", "score", "nmatch")
                      .orderBy(F.desc("score"), F.asc("doc_id")))
        return top
    finally:
        blocks.unpersist(False)


def phrase_match(spark: SparkSession, out_dir: str, phrase: str) -> DataFrame:
    """Positional phrase match (B11-B13 positional form).

    Positions live in the segment's raw ``pos_partial`` table (bucket-
    partitioned; the hot scoring path never reads it). Query plan: prune to
    the phrase's terms, aggregate per (doc, term) position arrays for that
    tiny subset, then check for a position p with term_i at p+i for all i —
    vectorized numpy per doc.
    """
    idx = open_index(out_dir)
    terms = A.py_tokens(phrase)
    if not terms:
        return spark.range(0).select(F.col("id").alias("doc_id"))
    if not idx.with_positions:
        raise ValueError("index built without positions")
    uniq = sorted(set(terms))
    buckets = sorted({bucket_of(t, idx.n_buckets) for t in uniq})
    raw = (_union_read(spark, idx, "pos_partial")
           .where(F.col("bucket").isin(buckets))
           .where(F.col("term").isin(uniq)))
    per_term = (raw.groupBy("doc_id", "term")
                .agg(F.sort_array(F.collect_list("pos")).alias("positions")))
    per_doc = (per_term.groupBy("doc_id")
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


# ---------------------------------------------------------------------------
# Full points_search composition over the segment (B13-B27)
# ---------------------------------------------------------------------------

MAX_EXPANSIONS = 200  # match_phrase_prefix cap, points_search.json:47


def _term_dict_all(spark: SparkSession, idx: IndexMeta) -> DataFrame:
    return _union_read(spark, idx, "term_dict")


def expand_prefix(spark: SparkSession, idx: IndexMeta, prefix: str) -> list[str]:
    """Dictionary prefix expansion, capped + ordered like ES max_expansions
    (term_dict min/max stats prune row groups on the term range)."""
    td = _term_dict_all(spark, idx)
    rows = (td.where(F.col("term").startswith(prefix))
              .select("term").orderBy("term").limit(MAX_EXPANSIONS).collect())
    return [r["term"] for r in rows]


def expand_fuzzy(spark: SparkSession, idx: IndexMeta, term: str,
                 max_ed: int) -> list[str]:
    """AUTO fuzzy expansion with length blocking (|len diff| <= ed) —
    the dictionary-blocking strategy from SURVEY.md §7 hard-part 5."""
    if max_ed == 0:
        return [term]
    td = _term_dict_all(spark, idx)
    n = len(term)
    rows = (td.where((F.length("term") >= n - max_ed)
                     & (F.length("term") <= n + max_ed))
              .where(F.levenshtein(F.col("term"), F.lit(term)) <= max_ed)
              .select("term").orderBy("term").limit(MAX_EXPANSIONS).collect())
    return [r["term"] for r in rows] or [term]


def search(spark: SparkSession, out_dir: str, params) -> DataFrame:
    """The full search pipeline (points_search template analogue):

    query analysis -> (prefix|fuzzy) dictionary expansion -> postings decode
    -> per-original-term dis_max over expansions (B15) -> OR/AND combine
    (B9/B10) -> function_score: saturation + static prior + exact bonus +
    recency decay (B19-B24) -> metadata filter (B17) -> top-k hydrated (B25).
    """
    from .params import SearchParams  # noqa: F401 (typing only)
    from .. import scoring as S2

    idx = open_index(out_dir)
    store = doc_store(spark, idx)
    q_terms = A.py_tokens(params.query)
    q_kw = " ".join(q_terms)

    if params.filter_role:
        store = store.where(F.col("role") == params.filter_role)
    if params.filter_tool:
        store = store.where(F.col("tool") == params.filter_tool)

    import hashlib
    q_kw_hash = hashlib.md5(q_kw.encode("utf-8")).hexdigest()

    if params.exact:
        # points_search_exact: keyword equality (by md5), constant score 12,
        # prominence (prior) tiebreak
        out = (store.where(F.col("kw_hash") == q_kw_hash)
               .select("doc_id", "conv_id", "turn_idx", "role", "tool", "ts",
                       F.lit(12.0).alias("score"), F.col("prior"))
               .orderBy(F.desc("score"), F.desc("prior"), F.asc("doc_id"))
               .limit(params.k))
        return out.drop("prior")

    if not q_terms:
        return (store.select("doc_id", "conv_id", "turn_idx", "role", "tool",
                             "ts", F.lit(0.0).alias("score")).limit(0))

    # expansion map: (orig, term)
    pairs: list[tuple[str, str]] = []
    for i, t in enumerate(q_terms):
        if params.prefix and i == len(q_terms) - 1:
            pairs += [(t, e) for e in (expand_prefix(spark, idx, t) or [t])]
        elif params.fuzzy:
            pairs += [(t, e) for e in
                      expand_fuzzy(spark, idx, t, params.auto_fuzz(t))]
        else:
            pairs.append((t, t))
    exp_terms = sorted({e for _, e in pairs})
    exp_df = spark.createDataFrame(pairs, "orig string, term string").distinct()

    blocks = _load_blocks(spark, idx, exp_terms)
    scored = _scored_postings(spark, idx, exp_terms, blocks)
    # dis_max over expansions of each original term (B15), then sum (B16/B9)
    per_orig = (scored.join(F.broadcast(exp_df), "term")
                .groupBy("doc_id", "orig").agg(F.max("s").alias("s")))
    agg = (per_orig.groupBy("doc_id")
           .agg(F.sum("s").alias("bm25"),
                F.count_distinct("orig").alias("nmatch")))
    if params.operator == "and":
        agg = agg.where(F.col("nmatch") == len(set(q_terms)))

    joined = agg.join(store, "doc_id")  # inner join applies B17 filters
    final = (S2.saturation(F.col("bm25"))
             + F.lit(S2.W_PRIOR) * F.col("prior")
             + F.when(F.col("kw_hash") == q_kw_hash,
                      F.lit(S2.W_EXACT)).otherwise(F.lit(0.0)))
    if params.recency:
        final = final + S2.recency_decay(F.col("ts"), params.now_epoch)
    return (joined.withColumn("score", final)
            .select("doc_id", "conv_id", "turn_idx", "role", "tool", "ts",
                    "score", "nmatch")
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(params.k))
