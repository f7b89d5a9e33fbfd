"""Training-data operator unit tests beyond the DuckDB oracle gate.

The oracle gate proves Spark==DuckDB but cannot catch recall holes BOTH
sides share; these tests pin the intended semantics independently.
"""
from __future__ import annotations

from itertools import combinations

from planet_search_spark.textops import simhash_banded_pairs


def _pairs(spark, sims):
    df = spark.createDataFrame(sims, "doc_id long, simhash long")
    rows = simhash_banded_pairs(df).collect()
    return {(r["doc_a"], r["doc_b"]): r["hamming"] for r in rows}


def test_simhash_banding_finds_top_byte_pair(spark):
    """Round 1's single top-byte band (simhash >> 8) missed any pair whose
    <=2 differing bits fell in the top byte — this planted pair is exactly
    that case and must now be found."""
    got = _pairs(spark, [(1, 0x0000), (2, 0xC000),   # bits 14,15 differ
                         (3, 0x0300)])               # bits 8,9 differ vs doc 1
    assert got[(1, 2)] == 2
    assert got[(1, 3)] == 2
    assert (2, 3) not in got  # hamming 4


def test_simhash_banding_is_hamming2_complete(spark):
    """Exhaustive check: every pair at Hamming distance <=2 is found, with
    the exact distance; nothing above 2 leaks through."""
    sims = [(i, v) for i, v in enumerate(
        [0x0000, 0x0001, 0x0003, 0x8001, 0xFFFF, 0x00F0, 0x00D0])]
    got = _pairs(spark, sims)
    want = {}
    for (ia, va), (ib, vb) in combinations(sims, 2):
        h = bin(va ^ vb).count("1")
        if h <= 2:
            want[(ia, ib)] = h
    assert got == want
