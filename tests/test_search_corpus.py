"""Declarative query corpus (fixtures/queries.json) through the FULL segment
search pipeline vs the independent brute-force pandas oracle — the analogue
of the reference's shared JSON case files driven through a real index
(search-sanity-cases.json / SearchCases.java:90-133; queries are never run
against made-up documents, README.md:77)."""
from __future__ import annotations

import json
import math
import os
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from planet_search_spark.indexing.build import build_index
from planet_search_spark.queries import engine as E
from planet_search_spark.queries.params import SearchParams
from planet_search_spark.transcripts import synthesize_transcripts
from tests.oracle_bf import BruteForceIndex

CASES = json.loads(
    (Path(__file__).resolve().parents[1] / "fixtures" / "queries.json")
    .read_text())


@pytest.fixture(scope="module")
def corpus_rows(spark):
    tx = synthesize_transcripts(spark, n_convs=50, seed=11)
    rows = [r.asDict() for r in
            tx.withColumn("ts_epoch", F.unix_timestamp("ts"))
              .drop("ts").collect()]
    return rows


@pytest.fixture(scope="module")
def bf(corpus_rows):
    return BruteForceIndex(corpus_rows)


@pytest.fixture(scope="module")
def index_dir(spark, corpus_rows, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("searchidx"))
    df = spark.createDataFrame(
        [(r["conv_id"], r["turn_idx"], r["role"], r["text"], r["tool"],
          r["ts_epoch"]) for r in corpus_rows],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts_epoch long")
    df = df.withColumn("ts", F.timestamp_seconds("ts_epoch")).drop("ts_epoch")
    build_index(spark, df, out, n_buckets=8, block_size=32,
                salt_target=128, n_groups=2)
    return out


def _params(case) -> SearchParams:
    return SearchParams(
        query=case["query"],
        operator=case.get("operator", "or"),
        prefix=case.get("prefix", False),
        fuzzy=case.get("fuzzy", False),
        exact=case.get("exact", False),
        filter_role=case.get("filterRole"),
        filter_tool=case.get("filterTool"),
        recency=case.get("recency", False),
        multifield=case.get("multifield", False),
        phrase_tiers=case.get("phraseTiers", False),
        k=case.get("k", 20))


def _normalize(rows):
    out = [(r["conv_id"], int(r["turn_idx"]),
            math.floor(r["score"] * 10000.0)) for r in rows]
    return sorted(out, key=lambda x: (-x[2], x[0], x[1]))


def _trio_passes(case, got, bf) -> bool:
    """Reference pass-criterion trio (SearchCases.java:90-133): expected id
    in top-N, OR exact keyword within ts-radius in top-N, OR any top-N hit
    within ts-radius. Returns True when ANY present criterion passes."""
    from planet_search_spark import analysis as A
    byid = {(d["conv_id"], d["turn_idx"]): d for d in bf.docs}
    top = got[:case.get("topN", len(got))]
    et = case.get("expectedTarget")
    if et and any(r["conv_id"] == et["convId"]
                  and r["turn_idx"] == et["turnIdx"] for r in top):
        return True
    rad, ets = case.get("radiusSec"), case.get("expectedTsEpoch")
    in_radius = [r for r in top
                 if rad is None or ets is None
                 or abs(byid[(r["conv_id"], r["turn_idx"])]["ts_epoch"]
                        - ets) <= rad]
    if case.get("expectedExactText") is not None and rad is not None:
        want_kw = A.py_keyword(case["expectedExactText"])
        if any(byid[(r["conv_id"], r["turn_idx"])]["kw"] == want_kw
               for r in in_radius):
            return True
    if rad is not None and ets is not None \
            and case.get("expectedExactText") is None and in_radius:
        return True
    return False


@pytest.mark.parametrize("case", CASES, ids=[c["id"] for c in CASES])
def test_case_rank_identical(spark, bf, index_dir, case):
    p = _params(case)
    got = [r.asDict() for r in E.search(spark, index_dir, p).collect()]
    want = bf.search(p).to_dict("records")
    assert _normalize(got) == _normalize(want), case["id"]
    # secondary criterion layer (trio cases only)
    if any(k in case for k in
           ("expectedTarget", "expectedExactText", "radiusSec")):
        if not _trio_passes(case, got, bf):
            if case.get("allowFailure"):
                pytest.skip(f"{case['id']}: allowFailure")
            pytest.fail(f"{case['id']}: no pass criterion satisfied")


def test_phrase_tier_outranks_higher_bm25(spark, tmp_path):
    """VERDICT done-criterion: with phrase tiers on, a doc containing the
    exact adjacent phrase must outrank a doc with strictly higher BM25 whose
    terms are never adjacent — matching the oracle in both modes."""
    rows = [
        # adjacent phrase but NOT an exact keyword match (no W_EXACT bonus)
        ("c", 0, "user", "alpha beta gamma", None, 1_767_225_600),
        # higher tf and higher length-prior, terms never adjacent
        ("c", 1, "user", "alpha x beta x alpha y beta y alpha z beta z",
         None, 1_767_225_601),
    ]
    tx = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, epoch bigint") \
        .withColumn("ts", F.timestamp_seconds("epoch")).drop("epoch")
    out = str(tmp_path / "tieridx")
    build_index(spark, tx, out, n_buckets=2, block_size=8, n_groups=1)
    bf2 = BruteForceIndex([
        dict(zip(("conv_id", "turn_idx", "role", "text", "tool", "ts_epoch"),
                 r)) for r in rows])
    for tiers, want_first in [(False, 1), (True, 0)]:
        p = SearchParams(query="alpha beta", phrase_tiers=tiers, k=2)
        got = [r.asDict() for r in E.search(spark, out, p).collect()]
        want = bf2.search(p).to_dict("records")
        assert _normalize(got) == _normalize(want)
        assert got[0]["turn_idx"] == want_first, f"tiers={tiers}"


def test_corpus_is_large_and_mostly_nonempty(bf):
    # round 3: grown to reference scale (315+18+4 cases in the reference)
    assert len(CASES) >= 300
    nonempty = sum(1 for case in CASES if len(bf.search(_params(case))))
    # the corpus must actually exercise most cases
    assert nonempty >= int(0.85 * len(CASES)), \
        f"only {nonempty} non-empty cases"
