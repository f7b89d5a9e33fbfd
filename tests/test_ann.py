"""ANN quality guards beyond the DuckDB oracle gate: the oracle proves the
bucketed search matches its own definition, but not that the approximation
is any GOOD — these tests pin recall against the exact brute-force top-k.
"""
from __future__ import annotations

import pytest

import planet_search_spark.ann  # noqa: F401 — registers the queries
from planet_search_spark.queries.logical import QUERIES

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tops(spark):
    def ids(name):
        fn, _ = QUERIES[name]
        return [r.vec_id for r in fn(spark, SF).collect()]
    return {name: ids(name) for name in
            ["ann_cosine_topk", "ann_ivf_topk", "ann_ivf_topk_probe2"]}


def test_ivf_recall_floor(tops):
    """Single-probe IVF recall@5 vs exact top-5 must stay above the floor
    (measured 1.0 on this corpus; 0.6 guards against silent regressions in
    the bucketing without over-fitting to one dataset)."""
    brute5 = set(tops["ann_cosine_topk"][:5])
    r1 = len(set(tops["ann_ivf_topk"]) & brute5) / 5
    assert r1 >= 0.6, r1


def test_multiprobe_recall_dominates_single(tops):
    brute5 = set(tops["ann_cosine_topk"][:5])
    r1 = len(set(tops["ann_ivf_topk"]) & brute5) / 5
    r2 = len(set(tops["ann_ivf_topk_probe2"]) & brute5) / 5
    assert r2 >= r1


def test_kmeans_refine_changes_or_keeps_assignments(spark):
    """The Lloyd round must produce a full assignment over the same vector
    universe (every vec assigned exactly once to a valid centroid)."""
    fn, _ = QUERIES["ann_kmeans_refine"]
    rows = fn(spark, SF).collect()
    fn0, _ = QUERIES["ann_ivf_assign"]
    base = fn0(spark, SF).collect()
    assert len(rows) == len(base)
    assert len({r.vec_id for r in rows}) == len(rows)
    from planet_search_spark.ann import N_CENTROIDS
    assert all(0 <= r.centroid_id < N_CENTROIDS for r in rows)
