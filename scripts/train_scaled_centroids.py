"""Train the scale-path IVF centroids ONCE and persist them as a fixture.

The scaled k-means training (``ann.kmeans_train``) is iterative and
therefore not SQL-expressible, but the ASSIGNMENT under a frozen model is a
pure argmax-cosine — exactly the ``ann_ivf_assign`` pattern. This script
runs the deterministic training (seeded k-means++ init, Lloyd to tol) on
the sf0.01 embeddings and writes ``fixtures/ivf_scaled_centroids.parquet``
(centroid_id:int, cv:array<double>), which both the Spark gate query
``ann_ivf_scaled_assign`` and its DuckDB oracle read — turning the one
rows-only gate row into a value-checked one. Re-run only if the training
algorithm or the sf0.01 fixture changes:

    python scripts/train_scaled_centroids.py
"""
from __future__ import annotations

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF_DIR = "/root/testdata/sf0.01"
OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures",
                   "ivf_scaled_centroids.parquet")


def main() -> None:
    from pyspark.sql import SparkSession

    from planet_search_spark.ann import kmeans_train

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .appName("train-scaled-centroids").getOrCreate())
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    model = kmeans_train(emb, max_iters=10, tol=1e-3, seed=13)
    cents = model["centroids"]
    pdf = pd.DataFrame({
        "centroid_id": range(cents.shape[0]),
        "cv": [list(map(float, row)) for row in cents],
    })
    pdf.to_parquet(os.path.abspath(OUT), index=False)
    print(f"wrote {cents.shape[0]} centroids (D={cents.shape[1]}, "
          f"iters={model['iters']}, movement={model['movement']:.2e}) "
          f"-> {os.path.abspath(OUT)}")
    spark.stop()


if __name__ == "__main__":
    main()
