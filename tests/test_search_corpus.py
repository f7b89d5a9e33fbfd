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
        k=case.get("k", 20))


def _normalize(rows):
    out = [(r["conv_id"], int(r["turn_idx"]),
            math.floor(r["score"] * 10000.0)) for r in rows]
    return sorted(out, key=lambda x: (-x[2], x[0], x[1]))


@pytest.mark.parametrize("case", CASES, ids=[c["id"] for c in CASES])
def test_case_rank_identical(spark, bf, index_dir, case):
    p = _params(case)
    got = [r.asDict() for r in E.search(spark, index_dir, p).collect()]
    want = bf.search(p).to_dict("records")
    assert _normalize(got) == _normalize(want), case["id"]


def test_corpus_has_nonempty_cases(bf):
    nonempty = 0
    for case in CASES:
        if len(bf.search(_params(case))):
            nonempty += 1
    # the corpus must actually exercise most cases
    assert nonempty >= len(CASES) - 4, f"only {nonempty} non-empty cases"
