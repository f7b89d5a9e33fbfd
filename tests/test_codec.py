"""Property tests for the varbyte/delta posting codec (numpy-vectorized)."""
from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from planet_search_spark.indexing import codec as C


@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=300))
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip(vals):
    a = np.array(vals, dtype=np.int64)
    assert np.array_equal(C.varbyte_decode(C.varbyte_encode(a)), a)


@given(st.sets(st.integers(min_value=0, max_value=10**12), max_size=200))
@settings(max_examples=100, deadline=None)
def test_postings_roundtrip(ids):
    doc_ids = np.array(sorted(ids), dtype=np.int64)
    tfs = (doc_ids % 17 + 1).astype(np.int64)
    db, tb = C.encode_postings(doc_ids, tfs)
    d2, t2 = C.decode_postings(db, tb)
    assert np.array_equal(doc_ids, d2)
    assert np.array_equal(tfs, t2)


def test_positions_roundtrip():
    rng = np.random.default_rng(1)
    for _ in range(50):
        n = int(rng.integers(1, 60))
        tfs = rng.integers(1, 20, size=n)
        pos = np.concatenate([
            np.sort(rng.choice(10_000, size=tf, replace=False))
            for tf in tfs])
        pb = C.encode_positions(tfs, pos)
        assert np.array_equal(C.decode_positions(pb, tfs), pos)


def test_empty():
    assert C.varbyte_encode(np.empty(0, np.int64)) == b""
    assert C.varbyte_decode(b"").size == 0
    assert C.encode_positions(np.empty(0, np.int64), np.empty(0, np.int64)) == b""


def test_compression_ratio():
    """Dense gaps must compress ~8x vs raw int64."""
    ids = np.arange(0, 10**6, 3, dtype=np.int64)
    db, _ = C.encode_postings(ids, np.ones(ids.size, np.int64))
    assert len(db) < ids.size * 1.2  # ~1 byte/gap
