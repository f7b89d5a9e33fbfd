"""Dev harness replicating the driver's correctness gate: run each
registered query on Spark and its oracle SQL on DuckDB at a given sf dir,
compare row count + order-insensitive values."""
from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

import planet_search_spark.ann  # noqa: E402,F401 — registers ANN queries
import planet_search_spark.multimodal  # noqa: F401,E402 — registers multimodal plumbing
import planet_search_spark.textops  # noqa: E402,F401 — registers training ops
import planet_search_spark.queries.reference_ops  # noqa: F401,E402 — registers §2A analogues
from planet_search_spark.queries.logical import QUERIES  # noqa: E402
from planet_search_spark.session import get_spark  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")
    return con


def compare(name, sdf, duck_df) -> str:
    spdf = sdf.toPandas()
    cols = sorted(spdf.columns)
    if sorted(duck_df.columns) != cols:
        return f"SCHEMA MISMATCH spark={cols} duck={sorted(duck_df.columns)}"
    a = spdf[cols].sort_values(cols).reset_index(drop=True)
    b = duck_df[cols].sort_values(cols).reset_index(drop=True)
    if len(a) != len(b):
        return f"ROWCOUNT spark={len(a)} duck={len(b)}"
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False)
        return f"OK ({len(a)} rows)"
    except AssertionError as e:
        return "VALUES: " + str(e).split("\n")[0]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:] or None
    spark = get_spark(cores=8)
    con = duck_con(sf_dir)
    failures = 0
    for name, (fn, sql) in QUERIES.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            if sql is None:
                print(f"{name:28s} rows-only: {sdf.count()}")
                continue
            ddf = con.sql(sql).df()
            res = compare(name, sdf, ddf)
            print(f"{name:28s} {res}")
            if not res.startswith("OK"):
                failures += 1
        except Exception as e:
            failures += 1
            print(f"{name:28s} ERROR {type(e).__name__}: {str(e)[:300]}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
