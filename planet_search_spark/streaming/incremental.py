"""Structured-Streaming incremental indexing.

The reference is a pure batch job (SURVEY.md §2.9) whose only streaming-ish
trait is cross-build state; our engine goes further: new transcript turns
stream in and become additional index segments (the Lucene/LSM segment
model). Global BM25 stays exact because df / N / sum_dl are additive across
segments and the reader sums them at query time
(:func:`planet_search_spark.queries.engine.open_index`).

``run_incremental`` wires ``readStream`` -> ``foreachBatch`` ->
:func:`incremental_update`; each micro-batch becomes one atomic segment
append (publish via live.json swap — a crashed micro-batch never publishes).
Use ``availableNow=True`` for drain-and-stop semantics (tests, catch-up
runs); the default processes continuously.
"""
from __future__ import annotations

from pyspark.sql import SparkSession

from ..indexing.build import incremental_update

TRANSCRIPT_SCHEMA = ("conv_id string, turn_idx int, role string, "
                     "text string, tool string, ts timestamp")


def run_incremental(spark: SparkSession, input_dir: str, out_dir: str,
                    checkpoint_dir: str, *, available_now: bool = True,
                    build_kw: dict | None = None,
                    max_segments: int = 0, gc_grace_sec: float = 3600.0):
    """Stream transcript parquet files from ``input_dir`` into the index at
    ``out_dir``. Returns the StreamingQuery (await/stop it yourself).

    ``max_segments > 0`` enables in-stream tiered compaction: after an
    append pushes the live segment count to the threshold, the micro-batch
    also merges the segments and GC-sweeps retired inputs past the grace
    period — continuous ingest keeps read amplification and disk bounded
    without an external maintenance job.
    """
    build_kw = dict(build_kw or {})

    def handle_batch(batch_df, epoch_id: int):
        if batch_df.isEmpty():
            return
        incremental_update(spark, out_dir, batch_df,
                           **build_kw)
        if max_segments > 0:
            from ..indexing.build import maybe_compact
            maybe_compact(spark, out_dir, max_segments=max_segments,
                          gc_grace_sec=gc_grace_sec,
                          n_groups=build_kw.get("n_groups", 1))

    reader = (spark.readStream.schema(TRANSCRIPT_SCHEMA)
              .option("maxFilesPerTrigger", 64)
              .parquet(input_dir))
    writer = (reader.writeStream
              .foreachBatch(handle_batch)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
