"""Multimodal binary-column plumbing: metadata projection (JVM) and
Arrow-batched feature extraction vs a plain-Python oracle."""

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from splade_spark.operators.multimodal import (
    decode_media,
    media_features,
    media_metadata,
)


@pytest.fixture(scope="module")
def blobs(spark):
    rng = np.random.default_rng(7)
    rows = []
    for i in range(20):
        n = int(rng.integers(0, 4096))
        rows.append((f"m{i:03d}", bytes(rng.integers(0, 256, n, dtype=np.uint8)),
                     "image/fake"))
    rows.append(("empty", b"", "image/fake"))
    df = spark.createDataFrame(rows, "media_id string, payload binary, kind string")
    return rows, df


def test_metadata_matches_python(blobs):
    rows, df = blobs
    got = {r["media_id"]: r for r in media_metadata(df, kind_col="kind").collect()}
    assert len(got) == len(rows)
    for mid, blob, kind in rows:
        g = got[mid]
        assert g["n_bytes"] == len(blob)
        assert g["sha256"] == hashlib.sha256(blob).hexdigest()
        assert g["kind"] == kind


def test_features_match_python(blobs):
    rows, df = blobs
    got = {r["media_id"]: r for r in media_features(df).collect()}
    for mid, blob, _ in rows:
        g = got[mid]
        assert g["n_bytes"] == len(blob)
        assert g["sha256"] == hashlib.sha256(blob).hexdigest()
        if blob:
            arr = np.frombuffer(blob, np.uint8)
            assert g["byte_mean_milli"] == round(float(arr.mean()) * 1000)
            counts = np.bincount(arr >> 4, minlength=16)
            assert list(g["histogram"]) == counts.tolist()
            p = counts[counts > 0] / arr.size
            ent = float(-(p * np.log2(p)).sum())
            assert g["byte_entropy_milli"] == round(ent * 1000)
        else:
            assert g["byte_mean_milli"] == 0
            assert sum(g["histogram"]) == 0


def test_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_media(b"\x89PNG", "image/png")
