"""Delta + varint posting-block codec (vectorized NumPy, no per-row Python).

Engine addition — the reference stores raw int32/float32 arrays
(/root/reference/src/indexing/sparse_index.py:333-340); the north rule asks
for delta+varint-compressed, impact-ordered posting lists. Layout:

- ``doc_gaps``: LEB128-style varint bytes of [first_doc_idx, gap1, gap2, ...]
  where gaps are deltas of the ASCENDING doc_idx sequence within a block
  (ascending-doc order within a block mirrors the reference's postings
  order, /root/reference/src/indexing/sparse_index.py:643-656).
- ``weights``: raw little-endian float32 — or float16 when the index is
  built with ``value_dtype="float16"`` (the reference's storage knob,
  /root/reference/src/indexing/sparse_index.py:14-36 + script/index.py:88-94:
  fp16 on disk, fp32 upcast when used). The block is self-describing:
  decode infers the dtype from bytes-per-posting (2 vs 4), so every
  consumer (query kernels, merge, shard splitter) upcasts transparently
  and always sees float32. At 100 TB fp16 halves the dominant posting
  payload for ~1e-3 relative weight error — rank-stable for all but
  exact-tie neighborhoods (pinned by test_fp16_index).

Both encode and decode are fully vectorized (bounded 10-iteration loops over
byte positions, each step operating on whole arrays) so they are fast inside
Arrow-batched pandas UDFs.
"""

from __future__ import annotations

import numpy as np

_SEVEN = np.uint64(7)
_MASK7 = np.uint64(0x7F)


def varint_encode(values: np.ndarray) -> bytes:
    """Encode a non-negative int array as concatenated LEB128 varints."""
    a = np.ascontiguousarray(values, dtype=np.uint64)
    n = a.size
    if n == 0:
        return b""
    lengths = np.ones(n, dtype=np.int64)
    tmp = a >> _SEVEN
    while tmp.any():
        lengths += (tmp > 0).astype(np.int64)
        tmp >>= _SEVEN
    offsets = np.empty(n, dtype=np.int64)
    offsets[0] = 0
    np.cumsum(lengths[:-1], out=offsets[1:])
    out = np.zeros(int(offsets[-1] + lengths[-1]), dtype=np.uint8)
    shifted = a.copy()
    pos = offsets.copy()
    remaining = lengths.copy()
    for _ in range(10):  # 64-bit varint is at most 10 bytes
        mask = remaining > 0
        if not mask.any():
            break
        byte = (shifted[mask] & _MASK7).astype(np.uint8)
        cont = (remaining[mask] > 1).astype(np.uint8)
        out[pos[mask]] = byte | (cont << 7)
        shifted[mask] >>= _SEVEN
        pos[mask] += 1
        remaining[mask] -= 1
    return out.tobytes()


def varint_decode(buf: bytes) -> np.ndarray:
    """Decode concatenated LEB128 varints back to uint64."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    ends = np.nonzero(is_last)[0]
    n_values = ends.size
    value_idx = np.zeros(b.size, dtype=np.int64)
    value_idx[1:] = np.cumsum(is_last[:-1].astype(np.int64))
    starts = np.empty(n_values, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    within = np.arange(b.size, dtype=np.int64) - starts[value_idx]
    contrib = (b & 0x7F).astype(np.uint64) << (within.astype(np.uint64) * _SEVEN)
    values = np.zeros(n_values, dtype=np.uint64)
    np.bitwise_or.at(values, value_idx, contrib)
    return values


def encode_block(
    doc_idx: np.ndarray, weights: np.ndarray, value_dtype: str = "float32"
) -> tuple[bytes, bytes]:
    """Encode one posting block. doc_idx MUST be strictly ascending.

    ``value_dtype``: "float32" (default) or "float16" (half-width storage;
    weights are rounded to the nearest representable half — the
    reference's fp16 storage mode)."""
    d = np.ascontiguousarray(doc_idx, dtype=np.int64)
    heads = np.empty(d.size, dtype=np.int64)
    if d.size:
        heads[0] = d[0]
        np.subtract(d[1:], d[:-1], out=heads[1:])
    gaps_bytes = varint_encode(heads)
    if value_dtype == "float16":
        w = np.ascontiguousarray(weights, dtype="<f2")
    elif value_dtype == "float32":
        w = np.ascontiguousarray(weights, dtype="<f4")
    else:
        raise ValueError(
            f"value_dtype must be float32 or float16, got {value_dtype!r}"
        )
    return gaps_bytes, w.tobytes()


def decode_block(doc_gaps: bytes, weights: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Decode a posting block back to (doc_idx int64 asc, weights float32).

    Self-describing dtype: 2 bytes/posting is fp16 (upcast to f32 on the
    way out — the reference's read path, script/index.py:88-94), 4 is f32.
    Consumers therefore always see float32 regardless of the storage knob.
    """
    gaps = varint_decode(doc_gaps).astype(np.int64)
    doc_idx = np.cumsum(gaps)
    if doc_idx.size and len(weights) == 2 * doc_idx.size:
        w = np.frombuffer(weights, dtype="<f2").astype("<f4")
    else:
        w = np.frombuffer(weights, dtype="<f4")
    return doc_idx, w
