"""Dev harness replicating the driver's correctness gate: run each
registered query on Spark and its oracle SQL on DuckDB at a given sf dir,
compare row count + order-insensitive values.

``--json PATH`` additionally writes a driver-format artifact (per-query
rows_match / schema_match / hash_match). The driver's own gate records only
the FIRST 50 registered queries; this artifact is the full-registry
evidence for the ones past the cap."""
from __future__ import annotations

import json
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
    argv = list(sys.argv[1:])
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        json_path = argv[i + 1]
        del argv[i:i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = argv[1:] or None
    spark = get_spark(cores=8)
    con = duck_con(sf_dir)
    failures = 0
    report: dict = {}
    for name, (fn, sql) in QUERIES.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            if sql is None:
                n = sdf.count()
                print(f"{name:28s} rows-only: {n}")
                report[name] = {"rows_match": None, "schema_match": None,
                                "hash_match": None, "spark_rows": n,
                                "oracle_rows": None, "err": None}
                continue
            ddf = con.sql(sql).df()
            res = compare(name, sdf, ddf)
            print(f"{name:28s} {res}")
            ok = res.startswith("OK")
            report[name] = {
                "rows_match": ok or not res.startswith("ROWCOUNT"),
                "schema_match": ok or not res.startswith("SCHEMA"),
                "hash_match": ok, "spark_rows": sdf.count(),
                "oracle_rows": len(ddf),
                "err": None if ok else res}
            if not ok:
                failures += 1
        except Exception as e:
            failures += 1
            print(f"{name:28s} ERROR {type(e).__name__}: {str(e)[:300]}")
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "spark_rows": None,
                            "oracle_rows": None,
                            "err": f"{type(e).__name__}: {str(e)[:300]}"}
    spark.stop()
    if json_path:
        with open(json_path, "w") as f:
            json.dump(report, f, indent=2)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
