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
SURVEY.md §4 "Lucene-side (delegated)") as data-level pruning — fully
DISTRIBUTED over block metadata (never a per-block driver collect; driver
state is one row per QUERY TERM plus a bounded top-``4k`` block-bound heap
— θ becomes a literal in a plain filter, adding no scan/join/window to the
main job):

* per block both bounds are recomputed under GLOBAL corpus stats from the
  stored (max_tf, min_dl) / (min_tf, max_dl) pairs — so they stay valid
  after multi-segment appends; global df(t) comes from the term dictionary
  (summed across segments).
* selectivity gate (cheap, term-level only): θ ≤ M := max_t mx(t), and a
  block of term t can only be pruned when ub(t,b) + (total − mx(t)) < θ,
  which for ANY t requires 2·M > total. All-hot-term OR queries (mx roughly
  equal across terms) fail the gate and skip the θ job entirely — pruning
  cannot win there, so the unpruned plan runs (this was a measured
  regression in round 1 when pruning was unconditional).
* benefit gate (term-level, zero jobs): θ can never exceed
  M_real := max_t idf_t·max_tfn_real(t) (the best ACTUAL posting, stored
  in term_dict at build time); pruning runs only when for SOME term the
  10th-percentile block ub (the term_bounds sidecar) plus its `other`
  sits below M_real — i.e. at least ~10% of that term's blocks could
  drop at the θ cap. Below that, the two θ jobs cost more than the
  decode they save (the homogeneous-bounds uniform-corpus case, a
  measured net loss) and are skipped. Performance decision only — gating
  never changes results.
* θ = max over terms t of θ_t, where θ_t is the k-th largest REAL decoded
  per-term score among the postings of t's best blocks by descending
  UPPER bound (phase 1 is metadata-only; phase 2 fetches only the winning
  blocks' tf/dl payloads, bounded by the same row limit). ANY subset of
  t's postings yields a valid θ_t — adding postings only raises the k-th
  largest — and picking high-ub blocks finds the best real postings. Any
  k real docs' total scores are ≥ their t-contributions ≥ θ_t, so θ
  lower-bounds the true k-th best total.
  Blocks of ONE term are doc-disjoint (each doc appears once per posting
  list, and segments hold disjoint doc ranges); blocks of DIFFERENT terms
  may share docs, which is why θ is a max over per-term values, never a
  cross-term cumulative count.
* a block (t, b) is pruned iff ``ub(t,b) + Σ_{t'≠t} mx(t') < θ`` — applied
  as a plain column FILTER on the block relation (per-term constants via a
  literal map), so multi-segment indexes need no (term, block_id) join and
  block_id uniqueness across segments is irrelevant.
* θ-pruning is DISABLED under ``require_all``: θ lower-bounds the k-th
  best *disjunctive* score, so an AND-matching doc scoring below θ could
  lose a pruned term contribution and silently drop out of conjunctive
  results. Conjunctive queries get SOUND doc-range pruning instead
  (:func:`_and_range_prune_blocks`): every AND doc lies inside a
  rarest-term block's doc range, so other terms' non-overlapping blocks
  drop with exact membership AND scores — the Lucene two-pointer
  ``advance()`` skip as a broadcast range anti-filter on block metadata.

Exactness argument: if a block is pruned, every doc in it has true score
< θ; any doc with true score ≥ θ therefore keeps ALL its blocks and its
computed score is exact; since ≥ k docs score ≥ θ, the true top-k and their
scores are unchanged. Docs that lost a pruned contribution rank strictly
below θ and cannot displace the top-k. Verified against the unpruned path
in tests (including a multi-segment index where blocks provably drop).
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
from ..indexing.build import FIELDS, FIELD_BOOSTS, bucket_of

TEXT_FIELD = FIELDS["text"]


@dataclass
class IndexMeta:
    """Multi-segment index (the Lucene-segment model): global BM25 stats
    are exact because df / N / sum_dl are additive across segments —
    per FIELD (B8 multi-field indexing)."""
    out_dir: str
    seg_dirs: list
    n_docs: int          # global N of the text field = sum over segments
    avgdl: float         # global: sum(sum_dl) / sum(n_docs), exact int sums
    n_buckets: int
    with_positions: bool
    fields: dict         # field name -> {"n_docs": int, "sum_dl": int}

    @property
    def seg_dir(self) -> str:  # single-segment convenience (tests, hydration)
        return self.seg_dirs[0]

    def field_stats(self) -> dict:
        """field_id -> (N, avgdl) under global (cross-segment) stats."""
        from ..indexing.build import FIELDS
        out = {}
        for name, st in self.fields.items():
            n = st["n_docs"]
            out[FIELDS[name]] = (float(n),
                                 (st["sum_dl"] / n) if n else 1.0)
        return out


def open_index(out_dir: str) -> IndexMeta:
    with open(os.path.join(out_dir, "live.json")) as f:
        segs = json.load(f)["segments"]
    seg_dirs, n_docs, sum_dl = [], 0, 0
    n_buckets = with_positions = None
    fields: dict = {}
    for seg in segs:
        seg_dir = os.path.join(out_dir, "segments", seg)
        with open(os.path.join(seg_dir, "corpus_stats.json")) as f:
            cs = json.load(f)
        seg_dirs.append(seg_dir)
        n_docs += cs["n_docs"]
        sum_dl += cs.get("sum_dl", int(round(cs["avgdl"] * cs["n_docs"])))
        for fname, st in cs.get("fields", {}).items():
            acc = fields.setdefault(fname, {"n_docs": 0, "sum_dl": 0})
            acc["n_docs"] += st["n_docs"]
            acc["sum_dl"] += st["sum_dl"]
        if n_buckets is not None and cs["n_buckets"] != n_buckets:
            raise ValueError("segments disagree on n_buckets")
        n_buckets = cs["n_buckets"]
        with_positions = cs["with_positions"] if with_positions is None \
            else (with_positions and cs["with_positions"])
    if not fields:
        # every read path filters on the 'field' partition column, so a
        # pre-field segment is unreadable anyway — fail at open, not deep
        # inside a query plan (round-2 ADVICE: the silent fallback faked
        # backward compatibility that did not exist)
        raise ValueError(
            f"index at {out_dir!r} predates the per-field segment layout; "
            "rebuild it (corpus_stats.json lacks 'fields')")
    return IndexMeta(out_dir, seg_dirs, n_docs, sum_dl / n_docs,
                     n_buckets, with_positions, fields)


def _union_read(spark: SparkSession, idx: IndexMeta, sub: str) -> DataFrame:
    dfs = []
    for seg_dir in idx.seg_dirs:
        path = os.path.join(seg_dir, sub)
        dfs.append(spark.read.option("basePath", path).parquet(path))
    out = dfs[0]
    for d in dfs[1:]:
        # allowMissingColumns: additive schema evolution across segment
        # generations (e.g. term_dict.max_tfn_real, round 3) — readers
        # detect the resulting NULLs where the column matters
        out = out.unionByName(d, allowMissingColumns=True)
    return out


def doc_store(spark: SparkSession, idx: IndexMeta) -> DataFrame:
    return _union_read(spark, idx, "doc_store")


def _field_lit_col(idx: IndexMeta, which: int):
    """Per-field N (which=0) or avgdl (which=1) as a literal-map lookup."""
    stats = idx.field_stats()
    entries = [x for fid, pair in stats.items()
               for x in (F.lit(fid), F.lit(pair[which]))]
    return F.create_map(*entries)[F.col("field")]


def _load_blocks(spark: SparkSession, idx: IndexMeta, terms: list[str],
                 field_ids: tuple = (TEXT_FIELD,)) -> DataFrame:
    buckets = sorted({bucket_of(t, idx.n_buckets) for t in terms})
    return (_union_read(spark, idx, "postings")
            .where(F.col("bucket").isin(buckets))   # directory pruning
            .where(F.col("field").isin(list(field_ids)))
            .where(F.col("term").isin(list(set(terms)))))


def _decode_blocks(blocks: DataFrame) -> DataFrame:
    """Arrow-batched block decode -> one row per (term, doc_id).

    Vectorized per TERM, not per block: within each Arrow batch all of a
    term's block payloads are byte-concatenated and decoded in ONE varbyte
    pass per stream (varbyte is self-delimiting). Absolute doc_ids come from
    :func:`codec.decode_positions`'s segmented cumsum with per-block doc
    counts as segment lengths — the delta chain restarts with an absolute id
    at every block start by construction. Same trick as ``serve.py``;
    ~#query-terms iterations per batch instead of ~#blocks.
    """

    def decode(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            outs = []
            for (fid, t), g in pdf.groupby(["field", "term"], sort=False):
                n_docs = g["n_docs"].to_numpy(np.int64)
                ids = codec.decode_positions(b"".join(g["docs_bin"]), n_docs)
                outs.append(pd.DataFrame({
                    "field": np.repeat(np.int32(fid), ids.size),
                    "term": np.repeat(t, ids.size),
                    "doc_id": ids,
                    "tf": codec.varbyte_decode(
                        b"".join(g["tfs_bin"])).astype(np.float64),
                    "dl": codec.varbyte_decode(
                        b"".join(g["dls_bin"])).astype(np.float64)}))
            yield pd.concat(outs, ignore_index=True)

    return (blocks.select("field", "term", "n_docs",
                          "docs_bin", "tfs_bin", "dls_bin")
            .mapInPandas(decode, schema="field int, term string, "
                                        "doc_id long, tf double, dl double"))


# indexes whose θ machinery already ran once in this process (key =
# tuple(seg_dirs)); the first run fuses the θ payload fetch into the
# metadata heap job to halve cold-path job count — see _wand_prune_blocks
_THETA_SEEN: set = set()


def _fkey(fid: int, term: str) -> str:
    return f"{fid}:{term}"


def _fkey_col():
    return F.concat_ws(":", F.col("field").cast("string"), F.col("term"))


def _df_map_col(df_map: dict[str, float]):
    """(field:term) -> df as a literal-map lookup column (no join)."""
    if not df_map:  # no query term exists in the index: typed empty lookup
        return F.lit(None).cast("double")
    entries = [x for k, d in df_map.items() for x in (F.lit(k), F.lit(d))]
    return F.create_map(*entries)[_fkey_col()]


def _scored_postings(idx: IndexMeta, blocks: DataFrame,
                     df_map: dict[str, float]) -> DataFrame:
    """(field, term, doc_id, s) with exact per-field BM25 contributions.

    ``df_map`` holds the GLOBAL per-(field, term) doc frequencies (summed
    across segments, collected once — one tiny row per query term); lookups
    are literal map projections, so scoring adds no join to the plan, and
    each field is scored under its OWN corpus stats (per-field Lucene
    similarity semantics)."""
    decoded = _decode_blocks(blocks)
    return decoded.withColumn("s", S.bm25_term_score(
        F.col("tf"), _df_map_col(df_map), F.col("dl"),
        _field_lit_col(idx, 0), _field_lit_col(idx, 1)))


def _collect_term_stats(spark: SparkSession, idx: IndexMeta,
                        terms: list[str],
                        field_ids: tuple = (TEXT_FIELD,)) -> list:
    """One dict per query (field, term): df, max_score_ub, max_tfn_real,
    min_tfn, ub_tfn_q10 — same values as :func:`_term_stats`, computed by
    collecting the RAW per-segment rows (≤ segments × terms of them) and
    aggregating on the driver. The groupBy + left-join form planned 3
    stages (two Exchanges) for a handful of rows; this is one
    exchange-free scan job per query — the fixed per-query Spark-job cost
    is the dominant term at serving-adjacent latencies (round 7).
    """
    buckets = sorted({bucket_of(t, idx.n_buckets) for t in terms})
    tset = sorted(set(terms))
    fl = list(field_ids)
    null_d = F.lit(None).cast("double")
    td = (_union_read(spark, idx, "term_dict")
          .where(F.col("bucket").isin(buckets))
          .where(F.col("field").isin(fl))
          .where(F.col("term").isin(tset)))
    if "max_tfn_real" not in td.columns:
        td = td.withColumn("max_tfn_real", null_d)
    td = td.select("field", "term", "df", "max_tf", "min_dl",
                   "max_tfn_real", null_d.alias("min_tfn"),
                   null_d.alias("ub_tfn_q10"), F.lit(0).alias("_src"))
    plan = td
    if all(os.path.isdir(os.path.join(sd, "term_bounds"))
           for sd in idx.seg_dirs):
        tb = _union_read(spark, idx, "term_bounds")
        if "ub_tfn_q10" not in tb.columns:
            tb = tb.withColumn("ub_tfn_q10", null_d)
        tb = (tb.where(F.col("field").isin(fl))
              .where(F.col("term").isin(tset))
              .select("field", "term", null_d.alias("df"),
                      null_d.alias("max_tf"), null_d.alias("min_dl"),
                      null_d.alias("max_tfn_real"), "min_tfn",
                      "ub_tfn_q10", F.lit(1).alias("_src")))
        plan = td.unionByName(tb)
    acc: dict[tuple, dict] = {}
    for r in plan.collect():
        key = (r["field"], r["term"])
        a = acc.setdefault(key, {
            "field": r["field"], "term": r["term"], "df": 0.0,
            "max_tf": None, "min_dl": None, "max_tfn_real": None,
            "_mtr_nulls": 0, "min_tfn": None, "ub_tfn_q10": None})
        if r["_src"] == 0:                      # term_dict row (per segment)
            a["df"] += float(r["df"])
            if a["max_tf"] is None or r["max_tf"] > a["max_tf"]:
                a["max_tf"] = float(r["max_tf"])
            if a["min_dl"] is None or r["min_dl"] < a["min_dl"]:
                a["min_dl"] = float(r["min_dl"])
            if r["max_tfn_real"] is None:
                # a NULL from any pre-round-3 segment must poison the max
                # (an unknown segment max invalidates the θ cap)
                a["_mtr_nulls"] += 1
            elif (a["max_tfn_real"] is None
                  or r["max_tfn_real"] > a["max_tfn_real"]):
                a["max_tfn_real"] = float(r["max_tfn_real"])
        else:                                   # term_bounds sidecar row
            # min over segments: conservative toward pruning (an
            # underestimated q10 runs the θ jobs more often, never the
            # reverse); F.min semantics — NULLs skipped
            for c in ("min_tfn", "ub_tfn_q10"):
                v = r[c]
                if v is not None and (a[c] is None or v < a[c]):
                    a[c] = float(v)
    field_stats = idx.field_stats()
    out = []
    for a in acc.values():
        if a["_mtr_nulls"] > 0:
            a["max_tfn_real"] = None
        n_f, avgdl_f = field_stats[a["field"]]
        df, tf, dl = a["df"], a["max_tf"], a["min_dl"]
        # same expression order as scoring.bm25_term_score (JVM doubles)
        idf = math.log(1.0 + (n_f - df + 0.5) / (df + 0.5))
        tfn = tf / (tf + S.K1 * ((1.0 - S.B) + S.B * dl / avgdl_f))
        a["max_score_ub"] = idf * tfn
        del a["_mtr_nulls"], a["max_tf"], a["min_dl"]
        out.append(a)
    return out


def _stats_df_map(stats: list) -> dict[str, float]:
    return {_fkey(r["field"], r["term"]): float(r["df"]) for r in stats}


def _wand_prune_blocks(blocks: DataFrame, stats: list, idx: IndexMeta,
                       k: int, *, force: bool = False,
                       want_theta: bool = False):
    """Block-max WAND pruning — distributed θ with a BOUNDED driver state.

    Returns ``(blocks_kept, info)``. θ comes from one tiny extra job: a
    TakeOrderedAndProject heap over block METADATA (column-pruned scan of
    the three stat columns) collecting only the top ``max(64, 4k)`` lower
    bounds — never one row per block (the round-1 design collected ALL
    block metadata, which dies on a stopword at 10^12 turns). θ is then a
    literal in a plain column filter on the block relation: the main job
    gains no extra scan, no join, no window.

    θ_t scans term t's blocks by descending lb until ≥ k docs are covered
    (blocks of one (field, term) are doc-disjoint, also across segments);
    θ = max_t θ_t. Computing θ_t over the global-top-L prefix only WEAKENS
    θ (prefixes of each term's descending-lb order), never invalidates it.

    Static gate: pruning any block of term t needs other(t) = total − mx(t)
    < θ ≤ M, and min_t other(t) = total − M, so 2·M ≤ total proves no block
    can ever be pruned — skip the θ job entirely (e.g. three similar hot
    terms). ``force=True`` bypasses the gate (tests); ``want_theta``
    records θ for assertions.
    """
    if not stats:
        return blocks, {"gated": True, "theta": 0.0}
    mx = {_fkey(r["field"], r["term"]): float(r["max_score_ub"])
          for r in stats}
    field_stats = idx.field_stats()
    df_map = _stats_df_map(stats)
    total, m = sum(mx.values()), max(mx.values())
    if not force and 2.0 * m <= total + 1e-12:
        return blocks, {"gated": True, "theta": 0.0}
    # no-possible-prune gate: a block of t survives whenever
    # ub(t,b) + other(t) ≥ θ, and θ ≤ M_real = max_t idf_t·max_tfn_real(t)
    # (θ_t is a REAL per-term score, so it can never exceed t's best actual
    # posting — a much tighter cap than the (max_tf, min_dl) pairing bound).
    # With mn(t) = the MIN block ub of t (idf × the build-time min_tfn
    # sidecar), mn(t) + other(t) ≥ M_real for EVERY query term proves no θ
    # can drop any block — skip both θ jobs. This is the homogeneous-bounds
    # uniform-corpus case that made pruning a measured net loss; a
    # performance decision only, so cross-segment avgdl drift in the stored
    # tfn cannot affect correctness. NULL min_tfn / max_tfn_real
    # (pre-sidecar segments) disables the gate.
    def _idf(fk):
        n_f, _af = field_stats[int(fk.split(":", 1)[0])]
        dfv = df_map[fk]
        return math.log(1.0 + (n_f - dfv + 0.5) / (dfv + 0.5))
    by_fk = {_fkey(r["field"], r["term"]): r for r in stats}
    if not force:
        caps = [(_idf(fk) * float(r["max_tfn_real"]))
                if r["max_tfn_real"] is not None else None
                for fk, r in by_fk.items()]
        if all(c is not None for c in caps):
            m_real = max(caps)
            prunable = False
            for fk, v in mx.items():
                q10 = by_fk[fk]["ub_tfn_q10"]
                if q10 is None:
                    prunable = True
                    break
                if _idf(fk) * float(q10) + (total - v) < m_real - 1e-9:
                    prunable = True
                    break
            if not prunable:
                return blocks, {"gated": True, "theta": 0.0}
    n_col, avgdl_col = _field_lit_col(idx, 0), _field_lit_col(idx, 1)
    df_col = _df_map_col(df_map)
    # TWO-PHASE θ. Phase 1: metadata-only TakeOrderedAndProject (exactly
    # the round-2 job — no binary columns ride the heap shuffle; shipping
    # every candidate block's tf/dl payload through the sort was a measured
    # +0.5 s on a 3-term query). Phase 2: fetch (tf, dl) payloads for ONLY
    # the ≤ max(64, 4k) winning blocks (term + block_id pushdown) and take
    # θ_t as the k-th largest REAL decoded per-term score among them — far
    # tighter than the (min_tf, max_dl) pairing bound, which can undercut
    # every actual posting in a block (that left impact-stratified blocks
    # nearly unpruned). Validity: ANY subset of a term's postings gives a
    # valid θ_t (its k-th largest real score only grows as postings are
    # added, and those k docs' TOTAL scores are ≥ their t-contributions),
    # so θ = max_t θ_t lower-bounds the true k-th best total score
    # regardless of which blocks phase 1 picks. Phase 1 therefore picks by
    # the stored per-block MAX REAL score (``max_score``, computed from the
    # actual postings at encode time) — the blocks that provably hold the
    # best real postings, so θ_t reaches the true k-th-largest per-term
    # score whenever the top postings span ≥ k of the selected blocks.
    # (Ordering by a pairing bound — lb or even ub — selected
    # near-arbitrary blocks on uniform corpora and left θ visibly below
    # the best real scores.) Driver state stays bounded in both phases.
    ub = S.bm25_term_score(F.col("max_tf"), df_col, F.col("min_dl"),
                           n_col, avgdl_col)
    # COLD-PATH FUSION (round-6 VERDICT #3): the FIRST θ computation
    # against an index in this process pays full first-run cost per job
    # (plan compile for the novel literals, scan warm-up), and cold wand
    # measured ≈ noprune + two such jobs. On that first call the payload
    # columns ride phase 1's TakeOrderedAndProject directly — one job,
    # identical block selection, identical θ. Warm repeats keep the
    # metadata-only phase 1 (shipping every candidate's tf/dl payload
    # through the heap was a measured +0.5 s on a 3-term query).
    key = tuple(idx.seg_dirs)
    fused = key not in _THETA_SEEN
    _THETA_SEEN.add(key)
    meta_cols = ["field", "term", "n_docs", "block_id", "max_score"]
    top = (blocks.select(*(meta_cols + ["tfs_bin", "dls_bin"] if fused
                           else meta_cols))
           .orderBy(F.desc("max_score")).limit(max(64, 4 * k))
           .toPandas())
    theta = 0.0
    top["fkey"] = top["field"].astype(str) + ":" + top["term"]
    need = []
    for fk, g in top.groupby("fkey", sort=False):
        cum = g["n_docs"].cumsum()
        take = int(np.searchsorted(cum.to_numpy(), k) + 1)
        sel = g.iloc[:take]
        if int(sel["n_docs"].sum()) < k:
            continue          # term has < k postings in the collected top
        need.append(sel)
    pay = None
    if need:
        want = pd.concat(need)
        if fused:
            pay = want        # payloads already rode phase 1
        else:
            keys = set(zip(want["field"], want["term"], want["block_id"]))
            pay = (blocks.where(
                       F.col("term").isin(sorted(set(want["term"])))
                       & F.col("block_id").isin(
                           sorted({int(b) for b in want["block_id"]})))
                   .select("field", "term", "block_id",
                           "tfs_bin", "dls_bin")
                   .toPandas())
            pay = pay[[(f, t, b) in keys for f, t, b in
                       zip(pay["field"], pay["term"], pay["block_id"])]]
            pay["fkey"] = pay["field"].astype(str) + ":" + pay["term"]
    if pay is not None:
        for fk, g in pay.groupby("fkey", sort=False):
            tfs = codec.varbyte_decode(b"".join(g["tfs_bin"])).astype(float)
            dls = codec.varbyte_decode(b"".join(g["dls_bin"])).astype(float)
            if tfs.size < k:
                continue
            fid = int(g["field"].iloc[0])
            n_f, avgdl_f = field_stats[fid]
            dfv = df_map[fk]
            idf = math.log(1.0 + (n_f - dfv + 0.5) / (dfv + 0.5))
            s = idf * tfs / (tfs + S.K1 * (1 - S.B + S.B * dls / avgdl_f))
            theta = max(theta,
                        float(np.partition(s, s.size - k)[s.size - k]))
    if theta <= 0.0:
        return blocks, {"gated": False, "theta": 0.0}
    other_col = F.create_map(
        *[x for t, v in mx.items() for x in (F.lit(t), F.lit(total - v))]
    )[_fkey_col()]
    kept = blocks.where((ub + other_col) >= F.lit(theta - 1e-12))
    return kept, {"gated": False, "theta": theta}


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
    stats = _collect_term_stats(spark, idx, terms)
    scored = _scored_postings(idx, blocks, _stats_df_map(stats))
    agg = (scored.groupBy("doc_id")
           .agg(F.sum("s").alias("score"),
                F.count_distinct("term").alias("nmatch")))
    if require_all:
        agg = agg.where(F.col("nmatch") == len(terms))
    return agg


def _and_range_prune_blocks(blocks: DataFrame, stats: list) -> DataFrame:
    """Conjunctive doc-range pruning — SOUND under AND (unlike θ-pruning).

    Every AND-result doc has a posting for the RAREST query term, hence
    lies inside some rarest-term block's [first_doc, last_doc] range; a
    block of any other term containing such a doc necessarily overlaps
    that range (both contain the doc). So dropping other-term blocks that
    overlap NO rarest-term range removes only docs that cannot satisfy
    the conjunction, and every surviving doc keeps ALL its blocks — both
    membership and scores stay exact (the Lucene two-pointer advance()
    skip, expressed as a broadcast range anti-filter on block metadata).

    Applied only when the rarest term is genuinely selective (df ≤ 2^18,
    so its block-range relation broadcasts in KBs, and ≥ 4× rarer than
    the hottest term, so ranges don't cover the whole doc space).
    """
    if len(stats) < 2:
        return blocks
    dfs = {_fkey(r["field"], r["term"]): float(r["df"]) for r in stats}
    rarest = min(dfs, key=dfs.get)
    if dfs[rarest] > float(1 << 18) or max(dfs.values()) < 4 * dfs[rarest]:
        return blocks
    rare_blocks = blocks.where(_fkey_col() == F.lit(rarest))
    ranges = rare_blocks.select(F.col("first_doc").alias("_rf"),
                                F.col("last_doc").alias("_rl"))
    kept_others = (blocks.where(_fkey_col() != F.lit(rarest))
                   .join(F.broadcast(ranges),
                         (F.col("first_doc") <= F.col("_rl"))
                         & (F.col("last_doc") >= F.col("_rf")),
                         "left_semi"))
    return rare_blocks.unionByName(kept_others)


def bm25_topk(spark: SparkSession, out_dir: str, query: str, k: int = 20, *,
              require_all: bool = False, prune: bool = True,
              hydrate: bool = True, prune_stats: dict | None = None) -> DataFrame:
    """Top-k BM25 with distributed block-max WAND pruning; rank-identical to
    the unpruned path (and to the logical path) by construction — see the
    module docstring for the θ derivation, the selectivity gate, and the
    exactness argument.

    ``prune`` accepts ``"force"`` to bypass the selectivity gate (tests use
    it to guarantee the pruned code path runs). θ-pruning is always
    disabled under ``require_all`` (unsound for conjunctive results —
    docstring); conjunctive queries instead get SOUND doc-range pruning
    (:func:`_and_range_prune_blocks`). ``prune_stats``, when a dict, is
    filled with {theta, gated, blocks_total, blocks_kept} (the counts cost
    two extra metadata-only jobs; pass None outside tests).
    """
    idx = open_index(out_dir)
    terms = sorted(set(A.py_tokens(query)))
    if not terms:
        return spark.range(0).select(F.col("id").alias("doc_id"),
                                     F.lit(0.0).alias("score"))
    blocks = _load_blocks(spark, idx, terms)
    blocks_raw = blocks
    stats = _collect_term_stats(spark, idx, terms)
    do_prune = bool(prune) and not require_all
    if bool(prune) and require_all:
        blocks = _and_range_prune_blocks(blocks, stats)
    blocks_kept, info = (_wand_prune_blocks(blocks, stats, idx, k,
                                            force=(prune == "force"),
                                            want_theta=prune_stats is not None)
                         if do_prune else (blocks, {"gated": True,
                                                    "theta": 0.0}))
    if prune_stats is not None:
        prune_stats.update(info)
        prune_stats["blocks_total"] = blocks_raw.count()
        prune_stats["blocks_kept"] = blocks_kept.count()
    scored = _scored_postings(idx, blocks_kept, _stats_df_map(stats))
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


def dismax_topk(spark: SparkSession, out_dir: str, query: str, k: int = 20, *,
                boosts: dict | None = None, hydrate: bool = True) -> DataFrame:
    """Boosted multi-field dis_max top-k (B8 + B15): per field f, the doc's
    BM25 sum s_f is computed under f's OWN corpus stats, then
    ``score = max_f boost_f * s_f`` (dis_max, tie_breaker 0.0) — the segment
    form of the reference's ``dis_max`` over ``match name.* boost 5`` /
    ``alt_names boost 3`` clauses (points_search.json:66-93).
    """
    idx = open_index(out_dir)
    terms = sorted(set(A.py_tokens(query)))
    boosts = boosts or FIELD_BOOSTS
    field_ids = tuple(FIELDS[f] for f in boosts)
    if not terms:
        return spark.range(0).select(F.col("id").alias("doc_id"),
                                     F.lit(0.0).alias("score"))
    blocks = _load_blocks(spark, idx, terms, field_ids)
    stats = _collect_term_stats(spark, idx, terms, field_ids)
    scored = _scored_postings(idx, blocks, _stats_df_map(stats))
    boost_col = F.create_map(
        *[x for f, b in boosts.items()
          for x in (F.lit(FIELDS[f]), F.lit(float(b)))])[F.col("field")]
    per_field = (scored.groupBy("doc_id", "field")
                 .agg(F.sum("s").alias("s_f"))
                 .withColumn("boosted", boost_col * F.col("s_f")))
    agg = per_field.groupBy("doc_id").agg(F.max("boosted").alias("score"))
    top = agg.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    if hydrate:
        store = doc_store(spark, idx)
        top = (top.join(store, "doc_id")
                  .select("doc_id", "conv_id", "turn_idx", "role", "tool",
                          "ts", "score")
                  .orderBy(F.desc("score"), F.asc("doc_id")))
    return top


def _pos_rows(spark: SparkSession, idx: IndexMeta,
              terms: list[str]) -> DataFrame:
    """Bucket- and term-pruned (doc_id, term, pos) rows of the phrase's
    vocabulary (the only slice of ``pos_partial`` any phrase query reads)."""
    buckets = sorted({bucket_of(t, idx.n_buckets) for t in terms})
    return (_union_read(spark, idx, "pos_partial")
            .where(F.col("bucket").isin(buckets))
            .where(F.col("field") == TEXT_FIELD)
            .where(F.col("term").isin(sorted(set(terms))))
            .select("doc_id", "term", "pos"))


def _phrase_chain(raw: DataFrame, terms: list[str]) -> DataFrame:
    """(doc_id, pos) rows where terms[0..n-1] occur adjacently starting at
    pos — a pure-JVM positional self-join: candidate (doc_id, p) survives
    step i iff (doc_id, term_i, p + i) exists. Each step is an all-int
    equi-join (shuffle hash / whole-stage codegen); round 2's per-doc
    Python ``itertuples`` loop (flagged as the anti-pattern the north rule
    bans — O(N) docs for a stopword bigram) is gone entirely."""
    cand = raw.where(F.col("term") == terms[0]).select("doc_id", "pos")
    for i, t in enumerate(terms[1:], start=1):
        nxt = (raw.where(F.col("term") == t)
               .select("doc_id", (F.col("pos") - i).alias("pos")))
        cand = cand.join(nxt, ["doc_id", "pos"], "left_semi")
    return cand


def phrase_match(spark: SparkSession, out_dir: str, phrase: str) -> DataFrame:
    """Positional phrase match (B11-B13 positional form).

    Positions live in the segment's raw ``pos_partial`` table (bucket-
    partitioned; the hot scoring path never reads it). Query plan: prune to
    the phrase's terms, then a JVM-only positional self-join chain
    (:func:`_phrase_chain`) and a distinct over surviving doc_ids.
    """
    idx = open_index(out_dir)
    terms = A.py_tokens(phrase)
    if not terms:
        return spark.range(0).select(F.col("id").alias("doc_id"))
    if not idx.with_positions:
        raise ValueError("index built without positions")
    raw = _pos_rows(spark, idx, terms)
    return _phrase_chain(raw, terms).select("doc_id").distinct()


def phrase_prefix_match(spark: SparkSession, out_dir: str,
                        phrase: str) -> DataFrame:
    """Positional ``match_phrase_prefix`` (B13): the first n-1 terms match
    positionally like :func:`phrase_match`, and the LAST term matches any
    dictionary term with the given prefix (capped at MAX_EXPANSIONS like
    ES's ``max_expansions: 200``) at position p + n - 1
    (points_search.json:47,61; bbox_container.json:38-43).

    Plan: prefix-expand against the term dictionary (row-group pruned range
    scan), then the same JVM-only positional self-join chain as
    :func:`phrase_match` with the LAST join's right side being the union of
    all expansions' positions (shifted by n-1).
    """
    idx = open_index(out_dir)
    terms = A.py_tokens(phrase)
    if not terms:
        return spark.range(0).select(F.col("id").alias("doc_id"))
    if not idx.with_positions:
        raise ValueError("index built without positions")
    exact, prefix = terms[:-1], terms[-1]
    expansions = expand_prefix(spark, idx, prefix)
    if not expansions:
        return spark.range(0).select(F.col("id").alias("doc_id"))
    raw = _pos_rows(spark, idx, list(exact) + expansions)
    exp_rows = raw.where(F.col("term").isin(expansions))
    if not exact:  # single-term phrase: any expansion occurrence matches
        return exp_rows.select("doc_id").distinct()
    cand = _phrase_chain(raw, list(exact))
    last = exp_rows.select(
        "doc_id", (F.col("pos") - (len(terms) - 1)).alias("pos"))
    return (cand.join(last, ["doc_id", "pos"], "left_semi")
            .select("doc_id").distinct())


# ---------------------------------------------------------------------------
# Full points_search composition over the segment (B13-B27)
# ---------------------------------------------------------------------------

MAX_EXPANSIONS = 200  # match_phrase_prefix cap, points_search.json:47


def _term_dict_all(spark: SparkSession, idx: IndexMeta) -> DataFrame:
    return _union_read(spark, idx, "term_dict")


def expand_prefix(spark: SparkSession, idx: IndexMeta, prefix: str,
                  field_ids: tuple = (TEXT_FIELD,)) -> list[str]:
    """Dictionary prefix expansion over the queried FIELDS' vocabulary,
    capped + ordered like ES max_expansions (term_dict min/max stats prune
    row groups on the term range)."""
    td = _term_dict_all(spark, idx)
    rows = (td.where(F.col("field").isin(list(field_ids)))
              .where(F.col("term").startswith(prefix))
              .select("term").distinct()
              .orderBy("term").limit(MAX_EXPANSIONS).collect())
    return [r["term"] for r in rows]


def expand_fuzzy(spark: SparkSession, idx: IndexMeta, term: str,
                 max_ed: int, field_ids: tuple = (TEXT_FIELD,)) -> list[str]:
    """AUTO fuzzy expansion with SOUND dictionary blocking (SURVEY.md §7
    hard-part 5): the +/- ed length band plus the pigeonhole segment filter
    (:mod:`.fuzzy` — startswith/contains/endswith over ed+1 segments, which
    can never drop a true match) run as cheap JVM string predicates BEFORE
    ``levenshtein``, so the dictionary scan prunes ~20-50x instead of
    edit-distancing the whole vocabulary (round-2 VERDICT item 6)."""
    from . import fuzzy as FZ
    if max_ed == 0:
        return [term]
    td = _term_dict_all(spark, idx)
    n = len(term)
    rows = (td.where(F.col("field").isin(list(field_ids)))
              .where((F.length("term") >= n - max_ed)
                     & (F.length("term") <= n + max_ed))
              .where(FZ.block_col(term, max_ed, F.col("term")))
              .where(F.levenshtein(F.col("term"), F.lit(term)) <= max_ed)
              .select("term").distinct()
              .orderBy("term").limit(MAX_EXPANSIONS).collect())
    return [r["term"] for r in rows] or [term]


def search(spark: SparkSession, out_dir: str, params) -> DataFrame:
    """The full search pipeline (points_search template analogue):

    query analysis -> (prefix|fuzzy) dictionary expansion -> postings decode
    -> per-original-term dis_max over expansions (B15) -> OR/AND combine
    (B9/B10) -> function_score: saturation + static prior + exact bonus +
    recency decay (B19-B24) -> metadata filter (B17) -> top-k hydrated (B25).

    No WAND pruning on this path BY DESIGN: under function_score the
    per-doc add-ons (prior <= 0.3, recency <= 0.6, tiers) dominate the
    saturated text-score spread, so block bounds cannot exclude candidates
    — the same reason Lucene/ES disables dynamic top-k pruning when a
    function_score/rescore wraps the match query; pruning applies to the
    bare BM25 paths (``bm25_topk``, serve ``bm25_topk(prune=True)``).
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

    field_ids = ((TEXT_FIELD, FIELDS["meta"]) if params.multifield
                 else (TEXT_FIELD,))
    # expansion map: (orig, term) — expansions drawn from the queried
    # fields' dictionary
    pairs: list[tuple[str, str]] = []
    for i, t in enumerate(q_terms):
        if params.prefix and i == len(q_terms) - 1:
            pairs += [(t, e) for e in
                      (expand_prefix(spark, idx, t, field_ids) or [t])]
        elif params.fuzzy:
            pairs += [(t, e) for e in
                      expand_fuzzy(spark, idx, t, params.auto_fuzz(t),
                                   field_ids)]
        else:
            pairs.append((t, t))
    exp_terms = sorted({e for _, e in pairs})
    exp_df = spark.createDataFrame(pairs, "orig string, term string").distinct()
    blocks = _load_blocks(spark, idx, exp_terms, field_ids)
    scored = _scored_postings(
        idx, blocks,
        _stats_df_map(_collect_term_stats(spark, idx, exp_terms, field_ids)))
    # dis_max over expansions of each original term per field (B15), then
    # boosted should-sum across fields and terms (B16/B9/B8). AND requires
    # every original term matched in at least one field.
    per_orig = (scored.join(F.broadcast(exp_df), "term")
                .groupBy("doc_id", "field", "orig").agg(F.max("s").alias("s")))
    if params.multifield:
        w = F.create_map(
            *[x for f, b in FIELD_BOOSTS.items()
              for x in (F.lit(FIELDS[f]), F.lit(float(b)))])[F.col("field")]
    else:
        w = F.lit(1.0)
    agg = (per_orig.withColumn("ws", w * F.col("s"))
           .groupBy("doc_id")
           .agg(F.sum("ws").alias("bm25"),
                F.count_distinct("orig").alias("nmatch")))
    if params.operator == "and":
        agg = agg.where(F.col("nmatch") == len(set(q_terms)))

    # DOC-VALUES SPLIT (round-3 VERDICT #1, mirroring serve.py's numeric
    # doc values): function_score needs only (prior, ts, kw_hash) per
    # candidate, so the pre-top-k join ships a NARROW projection of the
    # (already B17-filtered) doc_store — on a hot term the candidate set is
    # O(N) and dragging conv_id/role/tool strings through that shuffle was
    # the last stored-string scale risk. The k winners alone hydrate the
    # stored strings after limit(k), exactly like bm25_topk's hydration.
    narrow = store.select("doc_id", "prior", "ts", "kw_hash")
    joined = agg.join(narrow, "doc_id")  # inner join applies B17 filters
    bool_score = F.col("bm25")
    if params.phrase_tiers:
        # constant_score phrase tiers INSIDE the bool score, before the
        # saturation function — points_search.json:16-27 (keyword phrase,
        # boost 12) and :74-85 (contained phrase, boost 6); both clauses
        # are independent should members like the reference's name/alt pair
        contained = (phrase_match(spark, out_dir, params.query)
                     .withColumn("tier6", F.lit(6.0)))
        joined = joined.join(contained, "doc_id", "left")
        bool_score = (bool_score
                      + F.when(F.col("kw_hash") == q_kw_hash,
                               F.lit(12.0)).otherwise(F.lit(0.0))
                      + F.coalesce(F.col("tier6"), F.lit(0.0)))
    final = (S2.saturation(bool_score)
             + F.lit(S2.W_PRIOR) * F.col("prior")
             + F.when(F.col("kw_hash") == q_kw_hash,
                      F.lit(S2.W_EXACT)).otherwise(F.lit(0.0)))
    if params.recency:
        final = final + S2.recency_decay(F.col("ts"), params.now_epoch)
    topk = (joined.withColumn("score", final)
            .select("doc_id", "score", "nmatch")
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(params.k))
    # hydrate stored strings for the k winners only (broadcast the k-row
    # side; the unfiltered store is fine — winners already passed B17)
    full = doc_store(spark, idx).select(
        "doc_id", "conv_id", "turn_idx", "role", "tool", "ts")
    return (full.join(F.broadcast(topk), "doc_id")
            .select("doc_id", "conv_id", "turn_idx", "role", "tool", "ts",
                    "score", "nmatch")
            .orderBy(F.desc("score"), F.asc("doc_id")))
