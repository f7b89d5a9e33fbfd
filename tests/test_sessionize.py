"""Structured-Streaming sessionization == the batch gate query on the same
events (the built-in session_window under readStream + watermark)."""
from __future__ import annotations

import pandas as pd

from planet_search_spark.streaming.sessionize import run_sessionize_stream


def test_streamed_sessions_equal_batch(spark, tmp_path):
    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    inp = str(tmp_path / "ev_in")
    # several files so the stream runs multiple micro-batches with state
    # carried across them
    src.repartition(6).write.mode("overwrite").parquet(inp)
    # files arrive in arbitrary order (backfill shape): the watermark must
    # exceed the data span or older files' rows are dropped at ingestion
    q = run_sessionize_stream(spark, inp, "sess_stream_test",
                              max_files_per_trigger=2,
                              watermark="3650 days")
    q.awaitTermination()
    got = spark.table("sess_stream_test").toPandas()
    import planet_search_spark.queries.reference_ops  # noqa: F401 — registers
    from planet_search_spark.queries.logical import QUERIES
    fn, _ = QUERIES["event_sessionize"]
    want = fn(spark, "/root/testdata/sf0.001").toPandas()
    cols = ["user_id", "session_start_q", "n_events", "value_sum_q"]
    assert len(want) > 100
    pd.testing.assert_frame_equal(
        got[cols].sort_values(cols).reset_index(drop=True),
        want[cols].sort_values(cols).reset_index(drop=True),
        check_dtype=False)
