"""Multimodal (binary) column plumbing: typed metadata + batch feature
extraction over opaque blobs.

Engine addition for large-scale training-data pipelines (no reference
counterpart — the reference is text-only). Media payloads are carried as
``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` so each task touches one column chunk of blobs at a time
(no per-row Python).

Decode: uncompressed 24-bit BMP has a REAL pure-NumPy decoder (and
encoder, for fixtures) — ``decode_media`` dispatches to it, so the
decode→feature path is exercised end-to-end with actual image bytes
(``image_features``). All other codecs (jpeg/png/audio/video) remain
honestly STUBBED behind NotImplementedError: those libraries are not in
this container; a deployment dispatches on ``kind`` to PIL/librosa/pyav
in the same place.

At 100 TB: blobs dominate bytes. Keeping them in a separate column means
Parquet column pruning skips them entirely for metadata-only queries, and
the feature extractor streams batches without materializing a partition.
"""

from __future__ import annotations

import hashlib
import struct

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


def encode_bmp(pixels: np.ndarray) -> bytes:
    """uint8 (height, width, 3) RGB array → uncompressed 24-bit BMP bytes
    (BITMAPINFOHEADER, bottom-up rows, BGR on disk, rows padded to 4).
    Pure NumPy — used to synthesize deterministic image fixtures."""
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) uint8, got shape {px.shape}")
    h, w, _ = px.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    stride = row_bytes + pad
    img_size = stride * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                       2835, 2835, 0, 0)
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, :row_bytes] = px[::-1, :, ::-1].reshape(h, row_bytes)  # bottom-up BGR
    return header + info + body.tobytes()


def _decode_bmp(blob: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP bytes → uint8 (height, width, 3) RGB.
    Handles bottom-up (positive height) and top-down (negative) layouts
    and 4-byte row padding. Raises ValueError on anything else."""
    if len(blob) < 54 or blob[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    offset = struct.unpack_from("<I", blob, 10)[0]
    hdr_size = struct.unpack_from("<I", blob, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    w, h_raw = struct.unpack_from("<ii", blob, 18)
    planes, bpp = struct.unpack_from("<HH", blob, 26)
    compression = struct.unpack_from("<I", blob, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"only uncompressed 24-bit BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    top_down = h_raw < 0
    h = abs(h_raw)
    stride = (w * 3 + 3) // 4 * 4
    need = offset + stride * h
    if len(blob) < need:
        raise ValueError(f"truncated BMP: {len(blob)} < {need} bytes")
    body = np.frombuffer(blob, dtype=np.uint8, count=stride * h, offset=offset)
    rows = body.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return np.ascontiguousarray(rows[:, :, ::-1])  # BGR → RGB


def decode_media(blob: bytes, kind: str) -> np.ndarray:
    """Decode a media payload to a NumPy array. Uncompressed 24-bit BMP
    decodes for real (pure NumPy, ``_decode_bmp``); every other codec is
    a STUB — the libraries are not in this environment; a deployment
    dispatches on ``kind`` to PIL/librosa/pyav here. The surrounding
    pipeline (schema, batching, feature UDF signature) does not depend on
    which codecs are present."""
    if kind == "image/bmp" or (blob[:2] == b"BM" and kind in ("", None, "unknown")):
        return _decode_bmp(blob)
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


IMAGE_FEATURE_SCHEMA = (
    "media_id string, width int, height int, "
    "mean_r_milli bigint, mean_g_milli bigint, mean_b_milli bigint"
)


def image_features(
    df: DataFrame, id_col: str = "media_id", blob_col: str = "payload",
    kind_col: str | None = None,
) -> DataFrame:
    """(id, image blob) → decoded-dimension features via the REAL decode
    path: Arrow-batched mapInPandas, each blob decoded with
    ``decode_media`` to pixels, per-channel means computed on the decoded
    array. Only the id/blob(/kind) columns cross into Python."""
    cols = [id_col, blob_col] + ([kind_col] if kind_col else [])

    def extract(batches):
        for pdf in batches:
            out = {
                "media_id": [], "width": [], "height": [],
                "mean_r_milli": [], "mean_g_milli": [], "mean_b_milli": [],
            }
            for i in range(len(pdf)):
                blob = pdf[blob_col].iloc[i]
                kind = str(pdf[kind_col].iloc[i]) if kind_col else "image/bmp"
                px = decode_media(
                    bytes(blob) if blob is not None else b"", kind
                )
                h, w = px.shape[:2]
                means = px.reshape(-1, 3).mean(axis=0) if h * w else np.zeros(3)
                out["media_id"].append(str(pdf[id_col].iloc[i]))
                out["width"].append(w)
                out["height"].append(h)
                # floored (not rounded): floor of an exact double is
                # bit-stable across engines; round() straddles banker's vs
                # half-away ties
                out["mean_r_milli"].append(int(float(means[0]) * 1000))
                out["mean_g_milli"].append(int(float(means[1]) * 1000))
                out["mean_b_milli"].append(int(float(means[2]) * 1000))
            yield pd.DataFrame(out)

    return df.select(*cols).mapInPandas(extract, schema=IMAGE_FEATURE_SCHEMA)


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
