"""Streaming exact-dedup RocksDB soak at ~1M distinct keys (round-5
VERDICT item 7): extends the pytest 108k-key soak by an order of
magnitude and records the per-trigger state telemetry — state rows,
bytes written per updated key, and the provider's in-memory footprint —
so the executor-disk budget at scale is a measured number, not a guess
(keys/GB = 1e9 / (bytes_per_key) per executor-disk GB).

8 input files x 130k rows with a 4k-per-file overlap stream through
``maxFilesPerTrigger=1`` (8 triggers), RocksDB provider + changelog
checkpointing — the 100 TB configuration.

Usage:  python3 scripts/stream_soak.py [out.json] [n_files] [rows_per_file]
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from planet_search_spark.session import get_spark  # noqa: E402
from planet_search_spark.streaming.stateful import (run_dedup_stream,  # noqa: E402
                                                    state_metrics)


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_stream_soak.json"
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    per_file = int(sys.argv[3]) if len(sys.argv) > 3 else 130_000
    overlap = 4_000   # rows per file duplicating the previous file's tail
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    tmp_root = os.environ.get(
        "SPARK_GRAFT_TMP",
        "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir())
    work = tempfile.mkdtemp(prefix="psearch_stream_", dir=tmp_root)
    in_dir = os.path.join(work, "in")
    os.makedirs(in_dir)
    spark = get_spark(app="stream_soak", cores=cpus,
                      shuffle_partitions=max(cpus, 32))
    try:
        uniq = per_file - overlap
        for i in range(n_files):
            # rows [i*uniq, i*uniq + per_file): the first `overlap` rows
            # repeat the previous file's tail -> cross-trigger dups
            lo = i * uniq
            df = spark.range(lo, lo + per_file).selectExpr(
                "concat('c', CAST(id % 9973 AS STRING)) AS conv_id",
                "CAST(id AS INT) AS turn_idx", "'user' AS role",
                "concat('stream soak text number ', CAST(id AS STRING)) "
                "AS text",
                "CAST(NULL AS STRING) AS tool",
                "timestamp_seconds(1767225600 + id) AS ts")
            df.coalesce(1).write.mode("overwrite") \
              .parquet(f"{work}/stage_{i}")
            part = [p for p in os.listdir(f"{work}/stage_{i}")
                    if p.endswith(".parquet")][0]
            os.rename(f"{work}/stage_{i}/{part}", f"{in_dir}/f{i}.parquet")
        expected = n_files * uniq + overlap   # last file's tail has no next
        t0 = time.time()
        q = run_dedup_stream(spark, in_dir, "stream_soak",
                             checkpoint=f"{work}/ckpt",
                             sink_path=f"{work}/out",
                             max_files_per_trigger=1,
                             state_store="rocksdb")
        q.awaitTermination(1800)
        wall = time.time() - t0
        n_out = spark.read.parquet(f"{work}/out").count()
        mets = state_metrics(q)
        last = mets[-1]
        tot_written = sum(m["state_bytes_written"] for m in mets
                          if m.get("state_bytes_written"))
        tot_updated = sum(m["rows_updated"] for m in mets
                          if m.get("rows_updated"))
        per_key = tot_written / max(tot_updated, 1)
        doc = {
            "metric": "stream_dedup_soak_sec",
            "value": round(wall, 1),
            "unit": "sec",
            "n_files": n_files, "rows_per_file": per_file,
            "rows_in": n_files * per_file,
            "distinct_keys_expected": expected,
            "rows_out": n_out,
            "dedup_exact": n_out == expected,
            "rows_per_sec": round(n_files * per_file / wall, 1),
            "final_state_rows": last["state_rows"],
            "state_bytes_written_total": tot_written,
            "state_bytes_per_key": round(per_key, 1),
            "peak_memory_used_bytes": max(m["memory_used_bytes"]
                                          for m in mets
                                          if m.get("memory_used_bytes")),
            "keys_per_executor_disk_gb": int(1e9 / per_key),
            "triggers": [{k: m.get(k) for k in
                          ("batch_id", "state_rows", "rows_updated",
                           "state_bytes_written", "memory_used_bytes")}
                         for m in mets],
        }
        with open(out_path, "w") as f:
            json.dump(doc, f, indent=1)
        print(json.dumps({k: v for k, v in doc.items()
                          if k != "triggers"}))
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
