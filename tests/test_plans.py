"""Physical-plan guards: the scale properties must be visible in the plan —
partition pruning on bucket directories, term predicate pushdown to the
parquet scan, broadcast joins for small dimensions. These are the
`.explain("formatted")` checks the 100 TB design depends on."""
from __future__ import annotations

import pytest

from planet_search_spark.queries import engine as E
from planet_search_spark.indexing.build import build_index
from planet_search_spark.transcripts import synthesize_transcripts


@pytest.fixture(scope="module")
def small_index(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("planidx"))
    build_index(spark, synthesize_transcripts(spark, n_convs=20), out,
                n_buckets=8, n_groups=1)
    return out


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_postings_scan_prunes_buckets_and_pushes_terms(spark, small_index):
    idx = E.open_index(small_index)
    blocks = E._load_blocks(spark, idx, ["error", "timeout"])
    plan = _plan(blocks)
    assert "PartitionFilters" in plan
    # bucket partition filter is present and non-trivial
    assert "bucket" in plan.split("PartitionFilters", 1)[1][:200]
    pushed = plan.split("PushedFilters", 1)[1][:300]
    assert "In(term" in pushed
    assert "EqualTo(field" in pushed or "field" in pushed  # field pushdown


def test_bm25_scores_plan_is_join_free(spark, small_index):
    """Per-term df ships as a literal-map projection (collected once, one
    row per query term), so the scoring plan has NO join at all — stricter
    than the round-1 broadcast-join assertion."""
    df = E.bm25_scores(spark, small_index, "error timeout")
    plan = _plan(df)
    assert "Join" not in plan, "scoring must be a pure projection"
    assert "SortMergeJoin" not in plan


def test_topk_is_take_ordered(spark, small_index):
    df = E.bm25_topk(spark, small_index, "error timeout", k=5,
                     prune=False, hydrate=False)
    assert "TakeOrderedAndProject" in _plan(df)


def test_logical_bm25_pushes_term_filter_to_scan(spark):
    """The inline path must push the isin(term) filter below the tf agg."""
    from planet_search_spark.queries.logical import QUERIES
    fn, _ = QUERIES["bm25_or"]
    plan = _plan(fn(spark, "/root/testdata/sf0.001"))
    assert "PushedFilters" in plan


def test_exact_path_pushes_kw_hash_to_scan(spark, small_index):
    """Exact-match search must push the kw_hash equality into the parquet
    scan (doc_store is written sorted by kw_hash, so row-group min/max
    stats make this a point read, not a full scan)."""
    from planet_search_spark.queries.params import SearchParams
    df = E.search(spark, small_index, SearchParams(query="error", exact=True))
    plan = _plan(df)
    pushed = plan.split("PushedFilters", 1)[1][:300]
    assert "kw_hash" in pushed


def test_phrase_plan_is_jvm_only(spark, small_index):
    """Round-3 guard: the positional phrase chain must compile to pure JVM
    joins — no Python evaluation stage anywhere in the plan (round 2's
    per-doc itertuples loop was the banned row-at-a-time pattern)."""
    df = E.phrase_match(spark, small_index, "out of memory")
    plan = _plan(df)
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                   "FlatMapGroupsInPandas"):
        assert marker not in plan, marker
    assert "Join LeftSemi" in plan or "LeftSemi" in plan
    # positions scan pushes term + field filters down
    pushed = plan.split("PushedFilters", 1)[1][:300]
    assert "term" in pushed


def test_phrase_prefix_plan_is_jvm_only(spark, small_index):
    df = E.phrase_prefix_match(spark, small_index, "out of mem")
    plan = _plan(df)
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, marker


def test_dismax_multifield_plan_shape(spark, small_index):
    """Multi-field dis_max: field+term filters pushed to the scan; the only
    join in the scoring plan is the final k-row hydration."""
    df = E.dismax_topk(spark, small_index, "error timeout", k=5,
                       hydrate=False)
    plan = _plan(df)
    pushed = plan.split("PushedFilters", 1)[1][:300]
    assert "In(term" in pushed
    assert "Join" not in plan
    assert "TakeOrderedAndProject" in plan


def test_search_plan_hydrates_strings_above_topk_only(spark, small_index):
    """Round-3 VERDICT #1 done-criterion: below the top-k, the full
    search() plan must touch NO stored string column except kw_hash — the
    candidate-set join reads the narrow (doc_id, prior, ts, kw_hash)
    doc-values projection; conv_id/role/tool hydrate only the k winners
    via a broadcast join ABOVE the TakeOrderedAndProject."""
    from planet_search_spark.queries.params import SearchParams
    df = E.search(spark, small_index,
                  SearchParams(query="error timeout", multifield=True,
                               phrase_tiers=True, recency=True, k=5))
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan
    head, below = plan.split("TakeOrderedAndProject", 1)
    # subtree below the top-k heap: scoring + narrow doc values only
    assert "conv_id" not in below
    # winners hydrate via a broadcast join above the heap
    assert "conv_id" in head
    assert "BroadcastHashJoin" in head or "BroadcastNestedLoopJoin" in head
