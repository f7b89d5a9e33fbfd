"""Low-latency serving reader over the SAME segment files the Spark engine
writes — the architectural mirror of the reference, where Spark/Planetiler
builds and Elasticsearch serves (``MainClass.java`` builds, the stored
templates serve): index segments are built distributed, then any number of
stateless searchers memory-map them for millisecond point queries.

No Spark session involved: pyarrow datasets with bucket/term predicate
pushdown + the same numpy varbyte codec. Results are EXACTLY the engine's
(same blocks, same float64 math, same tie-break) — asserted in tests.

At 100 TB this is the fan-out pattern: each searcher owns a bucket range
(the term-bucket partitioning is the shard key), the coordinator merges
per-shard top-k heaps — precisely ES's shard/coordinator split, but over
open parquet segments instead of Lucene files.
"""
from __future__ import annotations

import json
import math
import os
import numpy as np
import pyarrow.dataset as ds

from .. import analysis as A
from .. import scoring as S
from ..indexing import codec
from ..indexing.build import bucket_of


class LocalSearcher:
    """Stateless low-latency reader for one index directory (all segments)."""

    def __init__(self, out_dir: str):
        with open(os.path.join(out_dir, "live.json")) as f:
            segs = json.load(f)["segments"]
        self.seg_dirs = [os.path.join(out_dir, "segments", s) for s in segs]
        self.n_docs, self.sum_dl = 0, 0
        self.n_buckets = None
        self.fields: dict = {}   # field name -> {n_docs, sum_dl} (global)
        for sd in self.seg_dirs:
            with open(os.path.join(sd, "corpus_stats.json")) as f:
                cs = json.load(f)
            self.n_docs += cs["n_docs"]
            self.sum_dl += cs.get("sum_dl",
                                  int(round(cs["avgdl"] * cs["n_docs"])))
            for fname, st in cs.get("fields", {}).items():
                acc = self.fields.setdefault(fname, {"n_docs": 0, "sum_dl": 0})
                acc["n_docs"] += st["n_docs"]
                acc["sum_dl"] += st["sum_dl"]
            self.n_buckets = cs["n_buckets"]
        self.avgdl = self.sum_dl / self.n_docs
        self._postings = [ds.dataset(os.path.join(sd, "postings"),
                                     partitioning="hive")
                          for sd in self.seg_dirs]
        self._stores = [ds.dataset(os.path.join(sd, "doc_store"))
                        for sd in self.seg_dirs]
        self._store_cache = None  # lazy in-RAM stored-fields (page-cache analogue)
        self._term_cache: dict = {}  # term -> decoded (ids, tfs, dls)
        self._term_cache_cap = 4096

    # -- postings ------------------------------------------------------------

    def _blocks(self, terms: list[str], field_id: int = 0):
        buckets = sorted({bucket_of(t, self.n_buckets) for t in terms})
        filt = (ds.field("bucket").isin(buckets)
                & (ds.field("field") == field_id)
                & ds.field("term").isin(terms))
        cols = ["term", "n_docs", "docs_bin", "tfs_bin", "dls_bin"]
        out = []
        for d in self._postings:
            out.append(d.to_table(columns=cols, filter=filt))
        return out

    def _postings_arrays(self, terms: list[str], field_id: int = 0):
        """term -> (doc_ids, tfs, dls) numpy arrays, merged over segments.

        One vectorized decode per term per stream: all of a term's block
        payloads are byte-concatenated and varbyte-decoded in a single pass
        (varbyte is self-delimiting); absolute doc_ids come from a segmented
        cumsum that resets at each block boundary — the delta chain restarts
        with an absolute id at every block start by construction, which is
        exactly :func:`codec.decode_positions`'s semantics.
        """
        cached = {t: self._term_cache[(field_id, t)] for t in terms
                  if (field_id, t) in self._term_cache}
        missing = [t for t in terms if t not in cached]
        if not missing:
            return dict(cached)
        acc: dict[str, dict] = {t: {"n": [], "d": [], "t": [], "l": []}
                                for t in missing}
        for tbl in self._blocks(missing, field_id):
            tcol = tbl.column("term").to_pylist()
            ncol = tbl.column("n_docs").to_pylist()
            dbin = tbl.column("docs_bin").to_pylist()
            tbin = tbl.column("tfs_bin").to_pylist()
            lbin = tbl.column("dls_bin").to_pylist()
            for t, n, db, tb, lb in zip(tcol, ncol, dbin, tbin, lbin):
                a = acc[t]
                a["n"].append(n)
                a["d"].append(db)
                a["t"].append(tb)
                a["l"].append(lb)
        out = dict(cached)
        for t, a in acc.items():
            if not a["n"]:
                continue
            n_docs = np.asarray(a["n"], dtype=np.int64)
            ids = codec.decode_positions(b"".join(a["d"]), n_docs)
            out[t] = (ids, codec.varbyte_decode(b"".join(a["t"])),
                      codec.varbyte_decode(b"".join(a["l"])))
            if len(self._term_cache) < self._term_cache_cap:
                self._term_cache[(field_id, t)] = out[t]
        return out

    def _term_score(self, tfs: np.ndarray, dls: np.ndarray, df: float,
                    n: float | None = None,
                    avgdl: float | None = None) -> np.ndarray:
        n = self.n_docs if n is None else n
        avgdl = self.avgdl if avgdl is None else avgdl
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        return idf * tfs / (tfs + S.K1 * (1 - S.B + S.B * dls / avgdl))

    def _field_stats(self, fname: str) -> tuple:
        st = self.fields.get(fname)
        if not st:   # pre-field layout: text only
            return float(self.n_docs), self.avgdl
        n = st["n_docs"]
        return float(n), (st["sum_dl"] / n) if n else 1.0

    # -- queries ---------------------------------------------------------------

    def bm25_topk(self, query: str, k: int = 20, *,
                  require_all: bool = False, hydrate: bool = True):
        """Exact BM25 top-k; identical results to the Spark engine path."""
        terms = sorted(set(A.py_tokens(query)))
        posts = self._postings_arrays(terms) if terms else {}
        if not posts:
            return []
        all_ids = np.concatenate([p[0] for p in posts.values()])
        uniq = np.unique(all_ids)
        scores = np.zeros(uniq.size)
        nmatch = np.zeros(uniq.size, dtype=np.int32)
        for t, (ids, tfs, dls) in posts.items():
            idx = np.searchsorted(uniq, ids)
            s = self._term_score(tfs.astype(np.float64),
                                 dls.astype(np.float64), float(ids.size))
            np.add.at(scores, idx, s)
            nmatch[idx] += 1
        mask = np.ones(uniq.size, dtype=bool)
        if require_all:
            mask = nmatch >= len(terms)
        cand = np.flatnonzero(mask)
        if cand.size == 0:
            return []
        # top-k heap: argpartition by score, then WIDEN the cut to every
        # candidate tied with the boundary score before the exact
        # (score desc, doc_id asc) lexsort — argpartition alone resolves
        # boundary ties arbitrarily, breaking exact parity with the engine's
        # orderBy(score desc, doc_id asc).limit(k)
        kk = min(k, cand.size)
        if kk < cand.size:
            part = np.argpartition(-scores[cand], kk - 1)
            boundary = scores[cand[part[kk - 1]]]
            sel = cand[scores[cand] >= boundary]
        else:
            sel = cand
        order = sel[np.lexsort((uniq[sel], -scores[sel]))][:kk]
        rows = [{"doc_id": int(uniq[i]), "score": float(scores[i]),
                 "nmatch": int(nmatch[i])} for i in order]
        return self._hydrate(rows) if hydrate else rows

    def dismax_topk(self, query: str, k: int = 20, *,
                    boosts: dict | None = None, hydrate: bool = True):
        """Boosted multi-field dis_max top-k — exact parity with the Spark
        engine's :func:`planet_search_spark.queries.engine.dismax_topk`:
        per field f, s_f = summed BM25 under f's OWN corpus stats;
        score = max_f boost_f * s_f (tie_breaker 0.0)."""
        from ..indexing.build import FIELDS, FIELD_BOOSTS
        boosts = boosts or FIELD_BOOSTS
        terms = sorted(set(A.py_tokens(query)))
        if not terms:
            return []
        per_doc: dict = {}
        for fname, boost in boosts.items():
            fid = FIELDS[fname]
            n, avgdl = self._field_stats(fname)
            posts = self._postings_arrays(terms, fid)
            if not posts:
                continue
            all_ids = np.concatenate([p[0] for p in posts.values()])
            uniq = np.unique(all_ids)
            s_f = np.zeros(uniq.size)
            for _t, (ids, tfs, dls) in posts.items():
                idx = np.searchsorted(uniq, ids)
                np.add.at(s_f, idx, self._term_score(
                    tfs.astype(np.float64), dls.astype(np.float64),
                    float(ids.size), n, avgdl))
            boosted = float(boost) * s_f
            for d, v in zip(uniq.tolist(), boosted.tolist()):
                if v > per_doc.get(d, -1.0):
                    per_doc[d] = v
        if not per_doc:
            return []
        doc_ids = np.fromiter(per_doc.keys(), dtype=np.int64)
        scores = np.fromiter(per_doc.values(), dtype=np.float64)
        kk = min(k, doc_ids.size)
        if kk < doc_ids.size:
            part = np.argpartition(-scores, kk - 1)
            boundary = scores[part[kk - 1]]
            sel = np.flatnonzero(scores >= boundary)
        else:
            sel = np.arange(doc_ids.size)
        order = sel[np.lexsort((doc_ids[sel], -scores[sel]))][:kk]
        rows = [{"doc_id": int(doc_ids[i]), "score": float(scores[i])}
                for i in order]
        return self._hydrate(rows) if hydrate else rows

    def phrase_match(self, phrase: str, *, hydrate: bool = False):
        """Positional phrase match over the same ``pos_partial`` table the
        Spark engine reads — exact parity with ``engine.phrase_match``.
        Returns rows sorted by doc_id asc."""
        from ..indexing.build import FIELDS
        terms = A.py_tokens(phrase)
        if not terms:
            return []
        uniq = sorted(set(terms))
        buckets = sorted({bucket_of(t, self.n_buckets) for t in uniq})
        filt = (ds.field("bucket").isin(buckets)
                & (ds.field("field") == FIELDS["text"])
                & ds.field("term").isin(uniq))
        per_doc: dict = {}
        for sd in self.seg_dirs:
            d = ds.dataset(os.path.join(sd, "pos_partial"),
                           partitioning="hive")
            tbl = d.to_table(columns=["doc_id", "term", "pos"], filter=filt)
            docs = tbl.column("doc_id").to_numpy()
            toks = tbl.column("term").to_pylist()
            poss = tbl.column("pos").to_numpy()
            for i in range(len(docs)):
                per_doc.setdefault(int(docs[i]), {}).setdefault(
                    toks[i], []).append(int(poss[i]))
        out = []
        for doc_id in sorted(per_doc):
            tp = per_doc[doc_id]
            if len(tp) < len(uniq):
                continue
            cand = np.sort(np.asarray(tp[terms[0]], dtype=np.int64))
            for i, t in enumerate(terms[1:], start=1):
                nxt = np.asarray(tp.get(t, ()), dtype=np.int64)
                cand = cand[np.isin(cand + i, nxt)]
                if cand.size == 0:
                    break
            if cand.size:
                out.append({"doc_id": doc_id})
        return self._hydrate(out) if hydrate else out

    def _hydrate(self, rows):
        """Attach stored fields from the lazy in-RAM doc_store cache."""
        if self._store_cache is None:
            cols = ["doc_id", "conv_id", "turn_idx", "role", "tool"]
            parts = [st.to_table(columns=cols) for st in self._stores]
            import pyarrow as pa
            tbl = pa.concat_tables(parts)
            o = np.argsort(tbl.column("doc_id").to_numpy())
            self._store_cache = (
                tbl.column("doc_id").to_numpy()[o],
                {c: np.asarray(tbl.column(c).to_pylist(),
                               dtype=object)[o] for c in cols[1:]})
        sids, cols = self._store_cache
        for r in rows:
            j = int(np.searchsorted(sids, r["doc_id"]))
            if j < sids.size and sids[j] == r["doc_id"]:
                for c, arr in cols.items():
                    r[c] = arr[j]
        return rows
