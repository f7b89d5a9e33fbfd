"""Sound dictionary blocking for fuzzy (edit-distance) term expansion —
SURVEY.md §7 hard-part 5's "dictionary blocking" made concrete.

Pigeonhole segment filter (the PassJoin family of similarity-join filters):
split the query term into ``ed + 1`` contiguous segments; any candidate
within edit distance ``ed`` leaves at least one segment untouched by every
edit, and an untouched segment survives verbatim —

* first segment untouched  -> all edits sit strictly after it, so the
  candidate STARTS WITH it;
* last segment untouched   -> all edits sit strictly before it, so the
  candidate ENDS WITH it;
* a middle segment untouched -> it appears as a contiguous substring
  (position shifted by at most ``ed``; we use the weaker-but-sound
  ``contains``).

So ``startswith(s_0) OR contains(s_mid...) OR endswith(s_last)`` can never
drop a true match, while pruning the dictionary scan by roughly the
alphabet size per segment (~20-50x on natural-language vocabularies).
Combined with the +/- ed length band this replaces round 2's full
term-dictionary Levenshtein scan (ADVICE/VERDICT item 6: at ~10^9 planet-
scale vocab terms a per-query full scan is the wrong shape even when
distributed).

The same predicate exists twice from one segment list: a Spark Column for
the engine's term_dict scan and a pure-Python callable for the serving
reader — identical blocking on both paths by construction.
"""
from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def auto_fuzz(term: str) -> int:
    """ES ``fuzziness: AUTO`` bands (points_search.json:94-104)."""
    n = len(term)
    return 0 if n <= 2 else (1 if n <= 5 else 2)


def pigeonhole_segments(term: str, ed: int) -> list[str]:
    """Split ``term`` into ``ed + 1`` contiguous, as-even-as-possible
    segments (longer ones first, like PassJoin's even partition)."""
    k = ed + 1
    n = len(term)
    base, extra = divmod(n, k)
    segs, i = [], 0
    for j in range(k):
        ln = base + (1 if j < extra else 0)
        segs.append(term[i:i + ln])
        i += ln
    return [s for s in segs if s]


def block_col(term: str, ed: int, cand: Column) -> Column:
    """Spark predicate: candidate may be within ``ed`` of ``term``."""
    segs = pigeonhole_segments(term, ed)
    if len(segs) < ed + 1:   # term shorter than ed+1 chars: no sound prune
        return F.lit(True)
    conds = [cand.startswith(segs[0]), cand.endswith(segs[-1])]
    conds += [cand.contains(s) for s in segs[1:-1]]
    out = conds[0]
    for c in conds[1:]:
        out = out | c
    return out


def py_block(term: str, ed: int):
    """Python predicate with semantics identical to :func:`block_col`."""
    segs = pigeonhole_segments(term, ed)
    if len(segs) < ed + 1:
        return lambda c: True
    first, last, mids = segs[0], segs[-1], segs[1:-1]

    def pred(c: str) -> bool:
        return (c.startswith(first) or c.endswith(last)
                or any(m in c for m in mids))

    return pred


def lev_leq(a: str, b: str, ed: int) -> bool:
    """Banded Levenshtein <= ed (early-exit row minimum)."""
    if abs(len(a) - len(b)) > ed:
        return False
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        if min(cur) > ed:
            return False
        prev = cur
    return prev[-1] <= ed
