"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (full function_score search —
BM25 + saturation + static prior + exact bonus + recency decay) at sf0.001.
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with a DuckDB-checkable oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import planet_search_spark.ann  # noqa: F401 — registers ANN queries
import planet_search_spark.multimodal  # noqa: F401,E402 — registers multimodal plumbing
import planet_search_spark.textops  # noqa: F401 — registers training-data ops
import planet_search_spark.queries.reference_ops  # noqa: F401,E402 — registers §2A analogues
from planet_search_spark.queries.logical import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    fn, _ = QUERIES["function_score_search"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for each query (same column names)."""
    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
