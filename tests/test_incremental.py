"""Multi-segment + streaming incremental indexing: appended segments must
give EXACTLY the same BM25 results as one single-shot build over the full
corpus (df/N/sum_dl additivity), and the Structured-Streaming path must
land every turn exactly once."""
from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from planet_search_spark.indexing.build import build_index, incremental_update
from planet_search_spark.queries import engine as E
from planet_search_spark.queries.params import SearchParams
from planet_search_spark.transcripts import synthesize_transcripts


@pytest.fixture(scope="module")
def corpora(spark):
    a = synthesize_transcripts(spark, n_convs=30, seed=21)
    b = synthesize_transcripts(spark, n_convs=20, seed=22) \
        .withColumn("conv_id", F.concat(F.lit("b_"), "conv_id"))
    c = synthesize_transcripts(spark, n_convs=10, seed=23) \
        .withColumn("conv_id", F.concat(F.lit("c_"), "conv_id"))
    return a, b, c


KW = dict(n_buckets=8, block_size=32, salt_target=256, n_groups=1)


def _top(spark, out, query, k=10**6, **kw):
    # doc_id spaces differ between incremental and single-shot builds, so
    # equal-score ties are re-broken by the stable (conv_id, turn_idx) key;
    # with k >= corpus size the comparison covers the complete result set
    # (at a k-cutoff, equal-score ties may legitimately pick different docs)
    df = E.bm25_topk(spark, out, query, k=k, hydrate=True, **kw)
    rows = [(r.conv_id, r.turn_idx, round(r.score, 9)) for r in df.collect()]
    return sorted(rows, key=lambda x: (-x[2], x[0], x[1]))


def test_incremental_equals_single_shot(spark, corpora, tmp_path):
    a, b, c = corpora
    inc = str(tmp_path / "inc")
    build_index(spark, a, inc, **KW)
    incremental_update(spark, inc, b, **KW)
    incremental_update(spark, inc, c, **KW)
    with open(os.path.join(inc, "live.json")) as f:
        assert json.load(f)["segments"] == ["seg_1", "seg_2", "seg_3"]

    full = str(tmp_path / "full")
    build_index(spark, a.unionByName(b).unionByName(c), full, **KW)

    for q in ["error timeout retry", "spark", "the data", "kitten sitting"]:
        assert _top(spark, inc, q) == _top(spark, full, q), q
    # WAND across segments stays exact too
    assert _top(spark, inc, "error timeout", prune="force") == \
           _top(spark, inc, "error timeout", prune=False)


def test_full_search_across_segments(spark, corpora, tmp_path):
    a, b, _ = corpora
    inc = str(tmp_path / "inc2")
    build_index(spark, a, inc, **KW)
    incremental_update(spark, inc, b, **KW)
    p = SearchParams(query="error timeout", recency=True)
    rows = E.search(spark, inc, p).collect()
    assert len(rows) > 0
    convs = {r.conv_id for r in rows}
    # results can come from both segments
    assert any(c.startswith("b_") for c in convs) or len(rows) == p.k


def test_streaming_ingest(spark, corpora, tmp_path):
    from planet_search_spark.streaming.incremental import run_incremental
    a, b, c = corpora
    in_dir = str(tmp_path / "in")
    # two files arriving
    b.coalesce(1).write.mode("overwrite").parquet(in_dir + "/batch1")
    c.coalesce(1).write.mode("overwrite").parquet(in_dir + "/batch2")
    # flatten: stream source reads a directory of parquet files
    import shutil
    os.makedirs(in_dir + "/stream", exist_ok=True)
    i = 0
    for sub in ["batch1", "batch2"]:
        for fn in os.listdir(f"{in_dir}/{sub}"):
            if fn.endswith(".parquet"):
                shutil.copy(f"{in_dir}/{sub}/{fn}", f"{in_dir}/stream/f{i}.parquet")
                i += 1
    out = str(tmp_path / "sidx")
    build_index(spark, a, out, **KW)
    q = run_incremental(spark, in_dir + "/stream", out,
                        str(tmp_path / "ckpt"), build_kw=KW)
    q.awaitTermination(120)
    n_expected = a.count() + b.count() + c.count()
    idx = E.open_index(out)
    total = E.doc_store(spark, idx).count()
    # every non-empty turn landed exactly once
    from planet_search_spark.queries.logical import tokenized_docs
    want = tokenized_docs(a.unionByName(b).unionByName(c)).count()
    assert total == want
    # and search sees streamed docs
    res = E.bm25_topk(spark, out, "error timeout", k=10).collect()
    assert len(res) == 10
