"""Multimodal plumbing: stub decode shapes, metadata extraction, frame
sampling — the Spark-side schema/batch plumbing is real even though the
codec is stubbed."""
from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from planet_search_spark import multimodal as M


def test_decode_real_is_stubbed():
    with pytest.raises(NotImplementedError):
        M.decode_image(b"abc", mode="real")


def test_decode_fake_deterministic():
    a = M.decode_image(b"payload", mode="fake")
    b = M.decode_image(b"payload", mode="fake")
    w, h, _ = M.fake_dims(b"payload")
    assert a.shape == (h, w, 3) and a.dtype == np.uint8
    assert np.array_equal(a, b)


def test_extract_metadata_batches(spark):
    df = spark.createDataFrame(
        [(i, f"payload-{i}".encode()) for i in range(100)],
        "doc_id long, payload binary")
    meta = M.extract_metadata(df).toPandas().sort_values("doc_id")
    assert len(meta) == 100
    for _, r in meta.head(5).iterrows():
        w, h, nf = M.fake_dims(f"payload-{int(r.doc_id)}".encode())
        assert (r.width, r.height, r.n_frames) == (w, h, nf)
        assert r.n_bytes == len(f"payload-{int(r.doc_id)}".encode())


def test_sample_frames(spark):
    df = spark.createDataFrame([(1, b"x" * 10)], "doc_id long, payload binary")
    frames = M.sample_frames(df, every_k=2).toPandas()
    _, _, nf = M.fake_dims(b"x" * 10)
    assert list(frames.frame_idx) == list(range(0, nf, 2))
