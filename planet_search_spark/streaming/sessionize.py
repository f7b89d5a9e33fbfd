"""Structured-Streaming sessionization with the BUILT-IN session_window.

The exact aggregation the batch gate query ``event_sessionize`` runs
(``queries/reference_ops.py``) executes here under ``readStream`` with an
event-time watermark — the Spark-native path for stateful session rollups
over a live event stream (SURVEY.md §2C streaming posture goes beyond the
reference, which is batch-only). pytest asserts streamed == batch on the
same input.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import scoring as S

EVENTS_SCHEMA = ("event_id long, ts timestamp, user_id long, "
                 "event_type string, value double, props string")
SESSION_GAP_SEC = 1800


def session_agg(ev: DataFrame, gap_sec: int = SESSION_GAP_SEC) -> DataFrame:
    """Per-(user, session) rollup — shared by the batch gate query and the
    streaming pipeline so both produce byte-identical rows."""
    return (ev.groupBy("user_id",
                       F.session_window("ts", f"{gap_sec} seconds"))
            .agg(S.quantize(
                     # parquet ts is TIMESTAMP_NTZ; session TZ is UTC, so
                     # the cast matches DuckDB's epoch() of the naive value
                     F.unix_micros(F.min("ts").cast("timestamp"))
                     .cast("double") / F.lit(1_000_000.0)
                 ).alias("session_start_q"),
                 F.count("*").cast("long").alias("n_events"),
                 S.quantize(F.sum("value")).alias("value_sum_q"))
            .drop("session_window"))


def run_sessionize_stream(spark: SparkSession, input_dir: str,
                          query_name: str, *,
                          gap_sec: int = SESSION_GAP_SEC,
                          watermark: str = "2 hours",
                          max_files_per_trigger: int = 4):
    """Stream event parquet files into a sessionized memory table.

    ``complete`` output mode keeps every session updatable until the stream
    drains (availableNow). NOTE: rows older than (max event time seen −
    watermark) are dropped at INGESTION even in complete mode, so a
    backfill over unordered files needs a watermark wider than the data
    span (the deterministic-test configuration uses exactly that); a live
    pipeline tailing fresh events would use a tight watermark + ``append``
    to emit sessions once they can no longer grow. Returns the
    StreamingQuery.
    """
    ev = (spark.readStream.schema(EVENTS_SCHEMA)
          .option("maxFilesPerTrigger", max_files_per_trigger)
          .parquet(input_dir))
    agg = session_agg(ev.withWatermark("ts", watermark), gap_sec)
    return (agg.writeStream.format("memory").queryName(query_name)
            .outputMode("complete").trigger(availableNow=True).start())
