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
