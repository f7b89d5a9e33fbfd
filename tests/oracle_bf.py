"""Brute-force pandas oracle: an INDEPENDENT implementation of the full
search semantics (analyzer -> BM25 -> expansions -> function_score -> top-k)
in plain pandas/python, used to assert the Spark engine is rank-identical
(FIXTURES.md §3; pass criterion analogue of SearchCases.java:90-133).

Shares only the frozen constants and the pure-Python analyzer with the
engine — no Spark, no DataFrame code paths.
"""
from __future__ import annotations

import math
from collections import Counter

import pandas as pd

from planet_search_spark import analysis as A
from planet_search_spark import scoring as S


class BruteForceIndex:
    def __init__(self, rows: list[dict]):
        """rows: dicts with conv_id, turn_idx, role, text, tool, ts_epoch."""
        self.docs = []
        for r in sorted(rows, key=lambda r: (r["conv_id"], r["turn_idx"])):
            toks = A.py_tokens(r["text"])
            if not toks:
                continue
            mtoks = A.py_tokens(
                " ".join(x for x in (r["role"], r.get("tool")) if x))
            self.docs.append({
                **r, "toks": toks, "tf": Counter(toks), "dl": len(toks),
                "kw": " ".join(toks),
                "mtf": Counter(mtoks), "mdl": len(mtoks),
                "doc_id": len(self.docs),
            })
        self.n = len(self.docs)
        self.avgdl = sum(d["dl"] for d in self.docs) / max(self.n, 1)
        self.df = Counter()
        for d in self.docs:
            for t in set(d["toks"]):
                self.df[t] += 1
        self.vocab = sorted(self.df)
        # meta field: its OWN corpus stats (per-field BM25, B8)
        self.m_n = sum(1 for d in self.docs if d["mdl"] > 0)
        self.m_avgdl = (sum(d["mdl"] for d in self.docs)
                        / max(self.m_n, 1))
        self.mdf = Counter()
        for d in self.docs:
            for t in set(d["mtf"]):
                self.mdf[t] += 1

    def bm25(self, term: str, d: dict) -> float:
        tf = d["tf"].get(term, 0)
        if tf == 0:
            return 0.0
        df = self.df[term]
        idf = math.log(1.0 + (self.n - df + 0.5) / (df + 0.5))
        return idf * tf / (tf + S.K1 * (1 - S.B + S.B * d["dl"] / self.avgdl))

    def bm25_meta(self, term: str, d: dict) -> float:
        tf = d["mtf"].get(term, 0)
        if tf == 0:
            return 0.0
        df = self.mdf[term]
        idf = math.log(1.0 + (self.m_n - df + 0.5) / (df + 0.5))
        return idf * tf / (tf + S.K1 * (1 - S.B
                                        + S.B * d["mdl"] / self.m_avgdl))

    def prior(self, d: dict) -> float:
        base = S.ROLE_BASE.get(d["role"], 0.0)
        lognorm = min(1.0, math.log1p(d["dl"]) / math.log1p(S.PRIOR_DL_NORM))
        meta = 1.0 if d.get("tool") is not None else 0.0
        return min(1.0, max(0.0, S.PRIOR_FLOOR + 0.45 * base
                            + 0.40 * lognorm + 0.10 * meta))

    def expand(self, term: str, params) -> list[str]:
        vocab = self.vocab
        if getattr(params, "multifield", False):
            vocab = sorted(set(self.df) | set(self.mdf))
        if params.prefix_last:
            cands = [t for t in vocab if t.startswith(term)]
            return cands[:200] or [term]
        if params.fuzzy:
            ed = params.auto_fuzz(term)
            if ed == 0:
                return [term]
            cands = sorted(t for t in vocab
                           if abs(len(t) - len(term)) <= ed
                           and _lev(t, term) <= ed)
            return cands[:200] or [term]
        return [term]

    def search(self, params) -> pd.DataFrame:
        q_terms = A.py_tokens(params.query)
        q_kw = " ".join(q_terms)
        docs = self.docs
        if params.filter_role:
            docs = [d for d in docs if d["role"] == params.filter_role]
        if params.filter_tool:
            docs = [d for d in docs if d.get("tool") == params.filter_tool]
        out = []
        if params.exact:
            for d in docs:
                if d["kw"] == q_kw:
                    out.append((d, 12.0, 0))
            out.sort(key=lambda x: (-x[1], -self.prior(x[0]), x[0]["doc_id"]))
            out = out[:params.k]
            return pd.DataFrame(
                [{"conv_id": d["conv_id"], "turn_idx": d["turn_idx"],
                  "score": s} for d, s, _ in out])
        if not q_terms:
            return pd.DataFrame(columns=["conv_id", "turn_idx", "score"])
        # expansion sets per ORIGINAL term, unioned across occurrences —
        # exactly mirrors the engine's (orig, term) pair construction
        exp_by_orig: dict[str, set] = {}
        for i, t in enumerate(q_terms):

            class _P:
                prefix_last = params.prefix and i == len(q_terms) - 1
                fuzzy = params.fuzzy
                auto_fuzz = params.auto_fuzz
                multifield = getattr(params, "multifield", False)
            exp_by_orig.setdefault(t, set()).update(self.expand(t, _P))
        multifield = getattr(params, "multifield", False)
        phrase_tiers = getattr(params, "phrase_tiers", False)
        for d in docs:
            # per-field dis_max over expansions, boosted should-sum (B8/B15)
            per_orig_t = {o: max((self.bm25(e, d) for e in exp), default=0.0)
                          for o, exp in exp_by_orig.items()}
            if multifield:
                per_orig_m = {o: max((self.bm25_meta(e, d) for e in exp),
                                     default=0.0)
                              for o, exp in exp_by_orig.items()}
                bm = (5.0 * sum(per_orig_t.values())
                      + 3.0 * sum(per_orig_m.values()))
                matched = {o for o in per_orig_t
                           if per_orig_t[o] > 0.0 or per_orig_m[o] > 0.0}
            else:
                bm = sum(per_orig_t.values())
                matched = {o for o, s in per_orig_t.items() if s > 0.0}
            if not matched:
                continue
            if params.operator == "and" and len(matched) < len(set(q_terms)):
                continue
            if phrase_tiers:
                bm += 12.0 if d["kw"] == q_kw else 0.0
                bm += 6.0 if f" {q_kw} " in f" {d['kw']} " else 0.0
            score = (S.W_TEXT * bm / (bm + S.K_TEXT)
                     + S.W_PRIOR * self.prior(d)
                     + (S.W_EXACT if d["kw"] == q_kw else 0.0))
            if params.recency:
                age = params.now_epoch - d["ts_epoch"]
                x = max(0.0, age - S.REC_OFFSET)
                score += S.W_REC * math.exp(-0.5 * (x / S.REC_SCALE) ** 2)
            out.append((d, score))
        out.sort(key=lambda x: (-x[1], x[0]["doc_id"]))
        out = out[:params.k]
        return pd.DataFrame(
            [{"conv_id": d["conv_id"], "turn_idx": d["turn_idx"], "score": s}
             for d, s in out])


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]
