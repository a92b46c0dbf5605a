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


# ---------------------------------------------------------------------------
# Real BMP decode path (round-3 verdict item 7)
# ---------------------------------------------------------------------------

from splade_spark.operators.multimodal import (  # noqa: E402
    _decode_bmp,
    encode_bmp,
    image_features,
)


def test_bmp_round_trip_exact():
    rng = np.random.default_rng(11)
    for h, w in [(1, 1), (3, 4), (5, 5), (7, 2), (16, 9)]:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        out = _decode_bmp(encode_bmp(px))
        assert out.shape == (h, w, 3)
        assert (out == px).all(), (h, w)


def test_bmp_known_bytes():
    """Hand-verified layout: 1x2 image — 6 pixel bytes + 2 pad bytes per
    row, bottom-up, BGR on disk."""
    px = np.array([[[255, 0, 0], [0, 128, 64]]], dtype=np.uint8)  # R, then teal
    blob = encode_bmp(px)
    assert blob[:2] == b"BM"
    assert len(blob) == 54 + 8  # one padded row
    row = blob[54:]
    assert row[:3] == bytes([0, 0, 255])      # BGR of pure red
    assert row[3:6] == bytes([64, 128, 0])    # BGR of (0,128,64)
    assert row[6:8] == b"\x00\x00"            # stride padding
    assert (_decode_bmp(blob) == px).all()


def test_bmp_top_down_variant():
    """Negative height = top-down row order; decoder must honor it."""
    import struct

    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    blob = bytearray(encode_bmp(px))
    h = struct.unpack_from("<i", blob, 22)[0]
    struct.pack_into("<i", blob, 22, -h)
    # flip the stored rows so the image is unchanged under top-down order
    stride = (3 * 3 + 3) // 4 * 4
    body = bytes(blob[54:])
    rows = [body[i * stride:(i + 1) * stride] for i in range(h)]
    blob[54:] = b"".join(reversed(rows))
    assert (_decode_bmp(bytes(blob)) == px).all()


def test_bmp_error_paths():
    with pytest.raises(ValueError, match="magic"):
        _decode_bmp(b"JUNKJUNK" * 10)
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="truncated"):
        _decode_bmp(encode_bmp(px)[:-3])
    with pytest.raises(ValueError, match="shape"):
        encode_bmp(np.zeros((2, 2), dtype=np.uint8))


def test_decode_media_dispatches_bmp():
    px = np.full((2, 2, 3), 200, dtype=np.uint8)
    assert (decode_media(encode_bmp(px), "image/bmp") == px).all()
    # sniffed dispatch for unknown kind
    assert (decode_media(encode_bmp(px), "unknown") == px).all()
    with pytest.raises(NotImplementedError):
        decode_media(b"\xff\xd8\xff", "image/jpeg")


def test_image_features_spark(spark):
    rng = np.random.default_rng(13)
    rows = []
    want = {}
    for i in range(8):
        h, w = 2 + i % 3, 3 + i % 4
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        rows.append((f"m{i}", bytearray(encode_bmp(px))))
        means = px.reshape(-1, 3).astype(np.float64).mean(axis=0)
        want[f"m{i}"] = (w, h, *(int(m * 1000) for m in means))
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    got = {
        r["media_id"]: (r["width"], r["height"], r["mean_r_milli"],
                        r["mean_g_milli"], r["mean_b_milli"])
        for r in image_features(df).collect()
    }
    assert got == want


def test_read_media_dir_binaryfile_source(spark, tmp_path):
    import numpy as np

    from splade_spark.operators.multimodal import (
        decode_media,
        encode_bmp,
        media_metadata,
    )
    from splade_spark.sources.media import read_media_dir

    d = tmp_path / "media"
    (d / "sub").mkdir(parents=True)
    px = {
        "a.bmp": np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3),
        "sub/b.bmp": np.full((1, 2, 3), 7, dtype=np.uint8),
    }
    for name, arr in px.items():
        (d / name).write_bytes(encode_bmp(arr))
    (d / "notes.txt").write_bytes(b"not media")

    # glob pushdown keeps the txt file out at listing time
    got = read_media_dir(
        spark, str(d), glob="*.bmp", recursive=True
    ).collect()
    rows = {r["media_id"]: r for r in got}
    assert set(rows) == {"a.bmp", "sub/b.bmp"}
    for name, arr in px.items():
        r = rows[name]
        assert r["kind"] == "image/bmp"
        assert r["n_bytes"] == len(encode_bmp(arr))
        # the payload round-trips through the real decoder
        assert (decode_media(bytes(r["payload"]), "image/bmp") == arr).all()

    # downstream operators run unchanged on the source's frame
    meta = media_metadata(
        read_media_dir(spark, str(d), glob="*.bmp", recursive=True),
        kind_col="kind",
    ).collect()
    assert {m["media_id"] for m in meta} == {"a.bmp", "sub/b.bmp"}

    # max_bytes guards the heap off file-length metadata
    small = read_media_dir(
        spark, str(d), glob="*.bmp", recursive=True,
        max_bytes=len(encode_bmp(px["sub/b.bmp"])),
    ).collect()
    assert [r["media_id"] for r in small] == ["sub/b.bmp"]
