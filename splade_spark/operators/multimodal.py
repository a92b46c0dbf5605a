"""Multimodal (binary) column plumbing: typed metadata + batch feature
extraction over opaque blobs.

Engine addition for large-scale training-data pipelines (no reference
counterpart — the reference is text-only). Media payloads are carried as
``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` so each task touches one column chunk of blobs at a time
(no per-row Python). The actual media decode (image/audio codecs) is
STUBBED — the libraries are not in this container — behind
``decode_media``; everything Spark-side (schema, batching, partitioning,
deterministic features) is real and tested.

At 100 TB: blobs dominate bytes. Keeping them in a separate column means
Parquet column pruning skips them entirely for metadata-only queries, and
the feature extractor streams batches without materializing a partition.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "media_id string, kind string, n_bytes bigint, sha256 string"
)

FEATURE_SCHEMA = (
    "media_id string, n_bytes bigint, sha256 string, "
    "byte_mean_milli bigint, byte_entropy_milli bigint, "
    "histogram array<int>"
)

N_HIST_BUCKETS = 16


def decode_media(blob: bytes, kind: str):
    """Decode an image/audio/video payload. STUB: media codecs are not
    available in this environment; a deployment would dispatch on ``kind``
    to PIL/librosa/pyav here. The surrounding pipeline (schema, batching,
    feature UDF signature) does not depend on the codec."""
    raise NotImplementedError(
        f"media decode for kind={kind!r} requires codec libraries not "
        "present in this environment"
    )


def _byte_features(blob: bytes) -> tuple[int, str, int, int, list[int]]:
    """Deterministic blob features (real, codec-free): size, sha256,
    mean byte value, byte-level entropy, 16-bucket histogram."""
    arr = np.frombuffer(blob, dtype=np.uint8)
    n = arr.size
    sha = hashlib.sha256(blob).hexdigest()
    if n == 0:
        return 0, sha, 0, 0, [0] * N_HIST_BUCKETS
    counts = np.bincount(arr >> 4, minlength=N_HIST_BUCKETS)
    p = counts[counts > 0] / n
    entropy = float(-(p * np.log2(p)).sum())  # bits, ≤ 4 for 16 buckets
    return (
        n,
        sha,
        int(round(float(arr.mean()) * 1000)),
        int(round(entropy * 1000)),
        counts.astype("int32").tolist(),
    )


def media_features(
    df: DataFrame, id_col: str = "media_id", blob_col: str = "payload"
) -> DataFrame:
    """(id, blob) → FEATURE_SCHEMA rows via Arrow-batched mapInPandas.
    Column-pruned input: only the two needed columns reach Python."""

    def extract(batches):
        for pdf in batches:
            out = {
                "media_id": [], "n_bytes": [], "sha256": [],
                "byte_mean_milli": [], "byte_entropy_milli": [], "histogram": [],
            }
            for mid, blob in zip(pdf[id_col], pdf[blob_col]):
                blob = bytes(blob) if blob is not None else b""
                n, sha, mean_m, ent_m, hist = _byte_features(blob)
                out["media_id"].append(str(mid))
                out["n_bytes"].append(n)
                out["sha256"].append(sha)
                out["byte_mean_milli"].append(mean_m)
                out["byte_entropy_milli"].append(ent_m)
                out["histogram"].append(hist)
            yield pd.DataFrame(out)

    return df.select(id_col, blob_col).mapInPandas(extract, schema=FEATURE_SCHEMA)


def media_metadata(
    df: DataFrame,
    id_col: str = "media_id",
    blob_col: str = "payload",
    kind_col: str | None = None,
) -> DataFrame:
    """Typed metadata projection — pure JVM (no Python): size + sha256.
    The blob column is read but never crosses into Python."""
    kind = F.col(kind_col) if kind_col else F.lit("unknown")
    return df.select(
        F.col(id_col).cast("string").alias("media_id"),
        kind.alias("kind"),
        F.length(F.col(blob_col)).cast("bigint").alias("n_bytes"),
        F.sha2(F.col(blob_col), 256).alias("sha256"),
    )
