from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from planet_search_spark.session import get_spark  # noqa: E402

SF_TINY = "/root/testdata/sf0.001"
SF_SMALL = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="pytest", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    import duckdb
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF_TINY}/{t}.parquet')")
    yield con
    con.close()


def assert_frames_match(spdf, duck_df):
    """Order-insensitive, driver-style comparison."""
    import pandas as pd
    a = spdf.toPandas()
    cols = sorted(a.columns)
    assert sorted(duck_df.columns) == cols, f"schema {cols} vs {sorted(duck_df.columns)}"
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = duck_df[cols].sort_values(cols).reset_index(drop=True)
    assert len(a) == len(b), f"rowcount {len(a)} vs {len(b)}"
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
