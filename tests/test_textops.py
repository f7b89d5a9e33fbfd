"""Training-data operator unit tests beyond the DuckDB oracle gate.

The oracle gate proves Spark==DuckDB but cannot catch recall holes BOTH
sides share; these tests pin the intended semantics independently.
"""
from __future__ import annotations

from itertools import combinations

from planet_search_spark.textops import (simhash64_banded_pairs,
                                         simhash_banded_pairs)


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


# -- 64-bit simhash (the scale default, round 3) ------------------------------

def _pairs64(spark, sims):
    df = spark.createDataFrame(sims, "doc_id long, sim_hi long, sim_lo long")
    rows = simhash64_banded_pairs(df).collect()
    return {(r["doc_a"], r["doc_b"]): r["hamming"] for r in rows}


def test_simhash64_banding_is_hamming2_complete(spark):
    """Pigeonhole completeness at 64 bits: every Hamming<=2 pair is found
    with the exact distance, across ALL band positions (low/high halves,
    band-internal and band-straddling bit pairs); nothing above 2 leaks."""
    vals = [(0, 0), (0, 1), (0, 3), (0, 1 << 31), (0, (1 << 15) | (1 << 16)),
            (1, 0), (1 << 31, 0), ((1 << 31) | 1, 0),
            (0xFFFFFFFF, 0xFFFFFFFF), (1 << 15, 1 << 15), (3 << 30, 0)]
    sims = [(i, hi, lo) for i, (hi, lo) in enumerate(vals)]
    got = _pairs64(spark, sims)
    want = {}
    for (ia, ha, la), (ib, hb, lb) in combinations(sims, 2):
        h = bin(ha ^ hb).count("1") + bin(la ^ lb).count("1")
        if h <= 2:
            want[(ia, ib)] = h
    assert got == want


def test_simhash64_buckets_are_fine_grained(spark, tmp_path):
    """The point of widening: per-(band, value) bucket sizes stay tiny, so
    the self-join never degenerates (the 16-bit form had only 16 buckets
    per band). Also reports candidate counts like the VERDICT asks."""
    from pyspark.sql import functions as F
    from planet_search_spark import analysis as A
    from planet_search_spark.textops import (_spark_simhash64,
                                             SIMHASH64_BAND_BITS)
    from planet_search_spark.transcripts import synthesize_transcripts
    tx = synthesize_transcripts(spark, n_convs=40, seed=5)
    docs = (tx.select(F.monotonically_increasing_id().alias("doc_id"),
                      A.tokens_col(F.col("text")).alias("toks"))
            .where(F.size("toks") > 0))
    sims = _spark_simhash64(docs)
    n = sims.count()
    mask = (1 << SIMHASH64_BAND_BITS) - 1
    b0 = sims.select((F.col("sim_lo").bitwiseAND(F.lit(mask))).alias("b"))
    top = (b0.groupBy("b").count().agg(F.max("count")).collect()[0][0])
    # 65536 buckets/band: the hottest bucket must hold a tiny corpus slice
    assert top <= max(4, n // 16), (top, n)
