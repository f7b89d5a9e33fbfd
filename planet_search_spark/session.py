"""SparkSession factory with scale-appropriate defaults.

Local testing runs ``local[N]`` but every config here is chosen to also be
the right default on a 1000-executor cluster reading 100 TB:

* AQE on (runtime coalesce + skew-join splitting),
* Arrow execution for the pandas-UDF codec paths,
* UTC session timezone (cross-engine timestamp determinism),
* shuffle partitions sized for the local test rig; on a real cluster this is
  overridden per job (``--conf``) or left to AQE's coalescing.
"""
from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "planet-search-spark",
              cores: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(cores, 32)
    builder = SparkSession.builder.master(f"local[{cores}]")
    # shuffle/spill files on tmpfs when available: local-mode shuffles are
    # otherwise bottlenecked by the single VM disk and stop scaling
    local_dir = os.environ.get("SPARK_LOCAL_DIRS")
    if local_dir is None and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/spark-local"
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    return (
        builder
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .getOrCreate()
    )
