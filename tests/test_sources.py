"""Transcripts source abstraction: contract validation, parquet + catalog
paths, Iceberg-jar-absent diagnostics (the Iceberg DataSource itself needs
the runtime jar, absent in this sandbox; the catalog-table code path is
identical for temp views and is exercised through them)."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from planet_search_spark.sources import read_transcripts, \
    validate_transcripts
from planet_search_spark.transcripts import synthesize_transcripts


@pytest.fixture(scope="module")
def tx(spark):
    return synthesize_transcripts(spark, n_convs=5, seed=3)


def test_parquet_roundtrip_and_projection(spark, tx, tmp_path):
    # extra column must be projected away; column order normalized
    p = str(tmp_path / "tx.parquet")
    tx.withColumn("extra", F.lit(1)) \
        .select("extra", "ts", "tool", "text", "role", "turn_idx",
                "conv_id").write.parquet(p)
    out = read_transcripts(spark, p)
    assert out.columns == ["conv_id", "turn_idx", "role", "text", "tool",
                           "ts"]
    assert out.count() == tx.count()
    assert out.schema["turn_idx"].dataType.simpleString() == "int"


def test_catalog_table_path(spark, tx):
    tx.createOrReplaceTempView("tx_src_view")
    out = read_transcripts(spark, "tx_src_view", format="table")
    assert out.count() == tx.count()
    # auto-detection: dotted/bare identifier routes to the table reader
    out2 = read_transcripts(spark, "tx_src_view")
    assert out2.columns == out.columns


def test_missing_column_fails_fast(spark, tx):
    with pytest.raises(ValueError, match=r"\['tool'\]"):
        validate_transcripts(tx.drop("tool"))


def test_lossless_coercions_only(spark, tx):
    ok = validate_transcripts(
        tx.withColumn("turn_idx", F.col("turn_idx").cast("long")))
    assert ok.schema["turn_idx"].dataType.simpleString() == "int"
    with pytest.raises(ValueError, match="turn_idx"):
        validate_transcripts(
            tx.withColumn("turn_idx", F.col("turn_idx").cast("string")))


def test_time_travel_requires_iceberg(spark):
    with pytest.raises(ValueError, match="time travel"):
        read_transcripts(spark, "/tmp/x.parquet", format="parquet",
                         snapshot_id=7)


def test_iceberg_without_jar_is_actionable(spark):
    with pytest.raises((RuntimeError, Exception)) as ei:
        read_transcripts(spark, "/tmp/nope", format="iceberg")
    # either our actionable rewrap or (with a jar present) a normal
    # path-not-found — never a bare ClassNotFoundException
    assert "ClassNotFoundException" not in repr(ei.value.__class__)
