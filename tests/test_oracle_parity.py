"""Every registered logical query matches its DuckDB oracle at sf-tiny —
the same comparison the driver's correctness gate performs."""
from __future__ import annotations

import pytest

import planet_search_spark.ann  # noqa: F401 — registers ANN queries
import planet_search_spark.multimodal  # noqa: F401 — registers multimodal
import planet_search_spark.textops  # noqa: F401 — registers training ops
import planet_search_spark.queries.reference_ops  # noqa: F401,E402 — registers §2A analogues
from planet_search_spark.queries.logical import QUERIES
from tests.conftest import SF_TINY, assert_frames_match


@pytest.mark.parametrize("name", sorted(QUERIES.keys()))
def test_query_matches_oracle(spark, duck, name):
    fn, sql = QUERIES[name]
    sdf = fn(spark, SF_TINY)
    if sql is None:
        assert sdf.count() >= 0
        return
    assert_frames_match(sdf, duck.sql(sql).df())


def test_entry_contract(spark):
    import __spark_entry__ as E
    df = E.entry(spark)
    assert df.count() > 0
    qs, os_ = E.queries(), E.oracle_sql()
    assert set(os_.keys()) <= set(qs.keys())
    assert len(qs) >= 15


def test_fixpoint_bounded_rounds(spark):
    """A11 super-relation fixpoint: pointer doubling must resolve the
    conv forest (max depth ~4) in <= ceil(log2(depth)) + 2 rounds, and a
    deep 64-node chain in <= 8 — the bounded-iteration guarantee."""
    from pyspark.sql import functions as F
    from planet_search_spark.queries.reference_ops import resolve_fixpoint
    from planet_search_spark.transcripts import transcripts_from_documents
    tx = transcripts_from_documents(spark, SF_TINY)
    n = F.substring("conv_id", 6, 10).cast("int")
    refs = (tx.select("conv_id").distinct()
            .select(F.col("conv_id").alias("node"),
                    F.when(n > 0, F.format_string(
                        "conv_%04d", F.floor(n / 4).cast("int")))
                     .alias("parent")))
    resolved, rounds = resolve_fixpoint(refs)
    assert rounds <= 4, rounds
    rows = {r.node: (r.anc, r.hops) for r in resolved.collect()}
    assert rows["conv_0000"] == ("conv_0000", 0)
    assert all(anc == "conv_0000" for anc, _ in rows.values())
    # spot-check a known path: 99 -> 24 -> 6 -> 1 -> 0 (depth 4)
    assert rows["conv_0099"][1] == 4
    # deep chain: 0 <- 1 <- 2 ... <- 63 resolves in log2 rounds
    chain = spark.createDataFrame(
        [(f"n{i:02d}", f"n{i-1:02d}" if i else None) for i in range(64)],
        "node string, parent string")
    resolved2, rounds2 = resolve_fixpoint(chain)
    assert rounds2 <= 8, rounds2
    got = {r.node: r.hops for r in resolved2.collect()}
    assert got["n63"] == 63 and got["n00"] == 0


def test_fixpoint_dangling_parent_is_treated_as_root(spark):
    """Round-5 ADVICE: a node whose parent id is NOT itself present in
    refs (sparse id space) must survive resolution with the dangling
    parent reported as its root — the recursive-CTE oracle's semantics —
    not be silently dropped by an inner self-join."""
    from planet_search_spark.queries.reference_ops import resolve_fixpoint
    refs = spark.createDataFrame(
        [("a", None),        # real root
         ("b", "a"),
         ("c", "ghost"),     # dangling parent: 'ghost' has no refs row
         ("d", "c")],
        "node string, parent string")
    resolved, _ = resolve_fixpoint(refs)
    rows = {r.node: (r.anc, r.hops) for r in resolved.collect()}
    assert set(rows) == {"a", "b", "c", "d"}, rows
    assert rows["c"] == ("ghost", 1)
    assert rows["d"] == ("ghost", 2)
    assert rows["b"] == ("a", 1)
