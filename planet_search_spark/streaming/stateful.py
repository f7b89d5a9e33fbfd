"""Custom stateful streaming operator: exactly-once STREAMING DEDUP via
``applyInPandasWithState`` — the Spark-native escape hatch for stateful
semantics the built-in operators can't express (``session_window`` covers
gap sessionization, but "emit only the FIRST occurrence of each content
key, forever, across triggers" needs explicit per-key state).

This is the streaming twin of the batch ``dedup_exact`` gate query
(``textops.py``): a training-data ingest pipeline deduplicates the live
document/turn stream BEFORE it reaches the index builder, so a re-crawled
or re-sent turn never spends index/build budget twice.

Scale design (the 100 TB story):

* state is keyed by the md5 of the normalized text — the stream is
  hash-partitioned by key, so state shards across executors exactly like
  any keyed aggregation; no driver state, no global set.
* per-key state is a single (first_seen_count,) row — the value payload
  is O(1); 10^12 distinct keys shard across the cluster's state stores
  (RocksDB-backed in production) the same way the posting shuffle shards.
* the operator emits rows only for keys whose first occurrence is in the
  current batch (append semantics) — downstream (the incremental index
  builder, ``streaming/incremental.py``) sees each distinct content
  exactly once.

Batch-parity contract: running the stream over any file sequence yields
exactly the rows the batch query ``SELECT ... argmin-by-(conv_id,
turn_idx) GROUP BY content_key`` keeps, when files arrive in that order —
pytest-asserted (streamed == batch first-occurrence set).
"""
from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .. import analysis as A

TRANSCRIPT_SCHEMA = ("conv_id string, turn_idx int, role string, "
                     "text string, tool string, ts timestamp")

OUT_SCHEMA = (TRANSCRIPT_SCHEMA + ", content_key string, dup_rank long")
STATE_SCHEMA = "seen long"


def content_key_col():
    """Deterministic content key: md5 of the NORMALIZED token stream (the
    same analyzer the index uses), so 'Hello,  World' and 'hello world'
    dedup together — textual near-identity, not byte identity."""
    return F.md5(F.array_join(A.tokens_col(F.col("text")), " "))


def _dedup_fn(key: tuple, pdfs: Iterable[pd.DataFrame],
              state: GroupState) -> Iterator[pd.DataFrame]:
    """Emit only the key's FIRST occurrence; afterwards the key's state
    suppresses every later duplicate. Within the first batch, keep the
    (conv_id, turn_idx)-smallest row (deterministic, matching the batch
    oracle's argmin). State payload: total rows seen (the duplicate
    count, O(1) per key)."""
    (seen,) = state.get if state.exists else (0,)
    chunks = [pdf for pdf in pdfs if len(pdf)]
    total = sum(len(c) for c in chunks)
    if total and seen == 0:
        first = (pd.concat(chunks) if len(chunks) > 1 else chunks[0]) \
            .sort_values(["conv_id", "turn_idx"], kind="mergesort") \
            .head(1).copy()
        first["dup_rank"] = 0
        yield first
    state.update((seen + total,))


def dedup_stream(tx: DataFrame) -> DataFrame:
    """Streaming-dedup transformation: one output row per distinct
    content key — its first occurrence — with the key and a dup_rank
    column attached."""
    keyed = tx.withColumn("content_key", content_key_col())
    return (keyed.groupBy("content_key")
            .applyInPandasWithState(
                _dedup_fn,
                outputStructType=OUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


def run_dedup_stream(spark: SparkSession, input_dir: str, query_name: str,
                     *, checkpoint: str, sink_path: str | None = None,
                     max_files_per_trigger: int = 1):
    """Stream transcript parquet files through the stateful dedup; state
    persists across triggers (and restarts, via the checkpoint), so a
    duplicate arriving hours later is still dropped.

    ``sink_path``: write the deduped stream to parquet there (the
    production shape — a file sink supports checkpoint RECOVERY, which
    the in-memory test sink does not); default is a memory table named
    ``query_name`` for single-run assertions."""
    tx = (spark.readStream.schema(TRANSCRIPT_SCHEMA)
          .option("maxFilesPerTrigger", max_files_per_trigger)
          .parquet(input_dir))
    out = dedup_stream(tx)
    w = (out.writeStream.outputMode("append")
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True))
    if sink_path is not None:
        return w.format("parquet").option("path", sink_path) \
                .queryName(query_name).start()
    return w.format("memory").queryName(query_name).start()
