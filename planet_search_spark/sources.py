"""Input-source abstraction for the transcripts table.

The production input is an Iceberg table of multi-turn transcripts
(BASELINE.json input_hint: ``conv_id:string, turn_idx:int32, role:string,
text:string, tool:string, ts:timestamp``); dev and CI read the same shape
from plain parquet. This module is the single entry point both paths go
through, so everything downstream (:func:`..indexing.build.build_index`,
the CLI, streaming ingest) sees one validated, column-pruned DataFrame
regardless of where the rows physically live.

Design notes for the 100 TB case:

* **Catalog tables, not file listings.** `read_transcripts(..., "cat.db.tx")`
  goes through ``spark.read.table`` — Iceberg's metadata layer then provides
  partition pruning, min/max file skipping and snapshot isolation for free;
  a raw parquet directory listing of a 10^12-row table would melt the
  driver. Time travel maps 1:1 onto Iceberg reader options
  (``snapshot-id`` / ``as-of-timestamp``) and is what makes index builds
  REPRODUCIBLE: an index's lineage can pin the exact snapshot it indexed.
* **Projection before anything else.** The contract projection
  (`_COLUMNS`) is applied at the source, so Catalyst pushes the 6-column
  ``ReadSchema`` into the scan no matter how wide the physical table is.
* **Validation fails fast on the driver** (schema check against the frozen
  contract) instead of deep inside a 1000-executor job.

The sandbox ships no Iceberg runtime jar, so the catalog path is exercised
in tests through ``spark.read.table`` over temp views (the identical code
path — Iceberg is just another V2 catalog to Spark) and the
format="iceberg" branch raises a clear actionable error when the jar is
absent rather than an opaque ClassNotFoundException.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# the frozen input contract (BASELINE.json input_hint)
TRANSCRIPT_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("turn_idx", T.IntegerType()),
    T.StructField("role", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("tool", T.StringType()),
    T.StructField("ts", T.TimestampType()),
])
_COLUMNS = [f.name for f in TRANSCRIPT_SCHEMA.fields]
# types we coerce silently (lossless widenings a warehouse commonly holds)
_COERCIBLE = {
    "turn_idx": {T.ShortType(), T.LongType(), T.IntegerType()},
    "ts": {T.TimestampType(), T.TimestampNTZType()},
}


def validate_transcripts(df: DataFrame) -> DataFrame:
    """Project + coerce ``df`` onto the frozen transcript contract.

    Raises ``ValueError`` listing every missing column at once (fail fast
    on the driver, not per-task); coerces int-width and timestamp-flavor
    differences; REJECTS anything else (a string turn_idx is a data bug,
    not a casting opportunity).
    """
    have = {f.name: f.dataType for f in df.schema.fields}
    missing = [c for c in _COLUMNS if c not in have]
    if missing:
        raise ValueError(
            f"transcripts input lacks column(s) {missing}; "
            f"required contract: {TRANSCRIPT_SCHEMA.simpleString()}")
    cols = []
    for f in TRANSCRIPT_SCHEMA.fields:
        actual = have[f.name]
        if actual == f.dataType:
            cols.append(F.col(f.name))
        elif actual in _COERCIBLE.get(f.name, set()):
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            raise ValueError(
                f"transcripts column {f.name!r} has type "
                f"{actual.simpleString()}, contract requires "
                f"{f.dataType.simpleString()}")
    return df.select(*cols)


def _looks_like_table(location: str) -> bool:
    # catalog identifiers: dotted, no path separators, no .parquet suffix —
    # but an existing filesystem path always wins (a relative directory
    # name like "data" is a parquet path, not a catalog table; the table
    # branch would fail it with a confusing TABLE_OR_VIEW_NOT_FOUND)
    import os
    if os.path.exists(location):
        return False
    return ("/" not in location and "\\" not in location
            and not location.endswith(".parquet"))


def read_transcripts(spark: SparkSession, location: str, *,
                     format: str = "auto",  # noqa: A002 — mirrors Spark API
                     snapshot_id: int | None = None,
                     as_of_timestamp: str | None = None) -> DataFrame:
    """Read the transcripts input from ``location`` and validate it.

    ``format``:

    * ``"auto"`` — catalog table identifier (``cat.db.tx``) via
      ``spark.read.table``; anything path-like via parquet.
    * ``"table"`` — force ``spark.read.table`` (Iceberg/any V2 catalog;
      also temp views, which is how tests drive this path jar-free).
    * ``"iceberg"`` — force the Iceberg DataSource (supports
      ``snapshot_id`` / ``as_of_timestamp`` time travel on a path-based
      table). Requires the iceberg-spark-runtime jar on the cluster.
    * ``"parquet"`` — plain parquet path.
    """
    if format == "auto":
        format = "table" if _looks_like_table(location) else "parquet"
    if (snapshot_id or as_of_timestamp) and format not in ("iceberg",
                                                           "table"):
        raise ValueError("time travel requires an Iceberg source "
                         "(format='iceberg' or a catalog table)")
    if format == "parquet":
        df = spark.read.parquet(location)
    elif format == "table":
        if snapshot_id is not None:
            df = spark.read.option("snapshot-id", snapshot_id) \
                .table(location)
        elif as_of_timestamp is not None:
            df = spark.read.option("as-of-timestamp", as_of_timestamp) \
                .table(location)
        else:
            df = spark.read.table(location)
    elif format == "iceberg":
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        if as_of_timestamp is not None:
            reader = reader.option("as-of-timestamp", as_of_timestamp)
        try:
            df = reader.load(location)
        except Exception as e:  # surface the actionable cause
            msg = str(e)
            if "Failed to find" in msg or "ClassNotFound" in msg \
                    or "DATA_SOURCE_NOT_FOUND" in msg:
                raise RuntimeError(
                    "Iceberg DataSource not on the classpath; add "
                    "org.apache.iceberg:iceberg-spark-runtime to "
                    "spark.jars.packages (or use format='table' with an "
                    "Iceberg catalog configured)") from e
            raise
    else:
        raise ValueError(f"unknown transcripts source format {format!r}")
    return validate_transcripts(df)
