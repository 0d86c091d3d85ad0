"""Posting-list codec: delta-gap + varint (VByte) with block-max metadata.

The reference's conceptual twin is dynamic int8 quantization ("reduces model
size 10x", /root/reference/README.md:247-272) — here the compressed artifact
is the posting list, per the north rule: doc_ids are delta-gapped then
varint-coded, term frequencies varint-coded, and every fixed-size block
carries (last_doc_id, max_score) skip metadata for block-max WAND.

All encode/decode paths are numpy-vectorized (they run inside
``applyInPandas`` workers over whole posting lists, never per-row Python
loops over postings).
"""

from __future__ import annotations

import numpy as np

#: Postings per block-max block.  128 is the standard block size in the
#: block-max WAND literature; tests override with 4 to exercise boundaries.
DEFAULT_BLOCK_SIZE = 128

_U64_1 = np.uint64(1)
_MASK7 = np.uint64(0x7F)


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array (vectorized, no per-value Python loop)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    nbytes = np.ones(v.shape, dtype=np.int64)
    for k in range(1, 10):
        nbytes += (v >= (_U64_1 << np.uint64(7 * k))).astype(np.int64)
    offsets = np.zeros(v.size, dtype=np.int64)
    np.cumsum(nbytes[:-1], out=offsets[1:])
    out = np.zeros(int(offsets[-1] + nbytes[-1]), dtype=np.uint8)
    for p in range(int(nbytes.max())):
        mask = nbytes > p
        byte = (v[mask] >> np.uint64(7 * p)) & _MASK7
        cont = (nbytes[mask] - 1 > p).astype(np.uint8) << 7
        out[offsets[mask] + p] = byte.astype(np.uint8) | cont
    return out.tobytes()


def varint_encode_segmented(values: np.ndarray,
                            group_starts: np.ndarray) -> list[bytes]:
    """LEB128-encode ``values`` ONCE and return one bytes blob per group
    (groups are contiguous runs delimited by ``group_starts``).

    Equivalent to ``[varint_encode(values[s:e]) for s, e in ...]`` but with
    a single vectorized pass over the whole array + cheap byte slices —
    the per-group-call overhead is what dominates kernels that emit
    millions of small posting/position lists per Arrow batch."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    gs = np.ascontiguousarray(group_starts, dtype=np.int64)
    if v.size == 0:
        return [b""] * gs.size
    nbytes = np.ones(v.shape, dtype=np.int64)
    for k in range(1, 10):
        nbytes += (v >= (_U64_1 << np.uint64(7 * k))).astype(np.int64)
    offsets = np.zeros(v.size, dtype=np.int64)
    np.cumsum(nbytes[:-1], out=offsets[1:])
    total = int(offsets[-1] + nbytes[-1])
    out = np.zeros(total, dtype=np.uint8)
    for p in range(int(nbytes.max())):
        mask = nbytes > p
        byte = (v[mask] >> np.uint64(7 * p)) & _MASK7
        cont = (nbytes[mask] - 1 > p).astype(np.uint8) << 7
        out[offsets[mask] + p] = byte.astype(np.uint8) | cont
    buf = out.tobytes()
    starts = offsets[gs]
    ends = np.empty_like(starts)
    ends[:-1] = starts[1:]
    ends[-1] = total
    return [buf[s:e] for s, e in zip(starts.tolist(), ends.tolist())]


def varint_decode(buf: bytes) -> np.ndarray:
    """Decode LEB128 bytes back to a uint64 array (vectorized)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_end = (b & 0x80) == 0
    ends = np.flatnonzero(is_end)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    group_id = np.zeros(b.size, dtype=np.int64)
    group_id[1:] = np.cumsum(is_end[:-1])
    within = np.arange(b.size, dtype=np.int64) - starts[group_id]
    parts = (b & 0x7F).astype(np.uint64) << (7 * within).astype(np.uint64)
    return np.bitwise_or.reduceat(parts, starts)


def varint_decode_segmented(
    blobs: list[bytes],
) -> tuple[np.ndarray, np.ndarray]:
    """Decode MANY LEB128 blobs in one vectorized pass.

    Returns ``(values uint64, starts int64)`` where ``starts`` has
    ``len(blobs) + 1`` entries and blob ``i``'s values are
    ``values[starts[i]:starts[i+1]]``.  Equivalent to calling
    :func:`varint_decode` per blob but with a single concatenated
    buffer — the per-call overhead is what dominates query kernels that
    decode one small position list per (doc, term) row."""
    n = len(blobs)
    lens_b = np.fromiter((len(b) for b in blobs), dtype=np.int64, count=n)
    starts = np.zeros(n + 1, dtype=np.int64)
    buf = b"".join(blobs)
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64), starts
    byte_bounds = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens_b, out=byte_bounds[1:])
    is_end = (b & 0x80) == 0
    ends = np.flatnonzero(is_end)
    vstarts = np.empty_like(ends)
    vstarts[0] = 0
    vstarts[1:] = ends[:-1] + 1
    gid = np.zeros(b.size, dtype=np.int64)
    gid[1:] = np.cumsum(is_end[:-1])
    within = np.arange(b.size, dtype=np.int64) - vstarts[gid]
    parts = (b & _MASK7.astype(np.uint8)).astype(np.uint64) << (
        7 * within
    ).astype(np.uint64)
    vals = np.bitwise_or.reduceat(parts, vstarts)
    # values per blob = end-bytes inside each blob's byte range (varint
    # streams are self-delimiting, so concatenation preserves framing)
    starts[1:] = np.searchsorted(ends, byte_bounds[1:] - 1, side="right")
    return vals, starts


def delta_encode(doc_ids: np.ndarray) -> np.ndarray:
    """Strictly-ascending doc_ids → gaps (first value absolute)."""
    d = np.ascontiguousarray(doc_ids, dtype=np.uint64)
    if d.size == 0:
        return d
    gaps = np.empty_like(d)
    gaps[0] = d[0]
    np.subtract(d[1:], d[:-1], out=gaps[1:])
    return gaps


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    """Inverse of :func:`delta_encode`."""
    return np.cumsum(np.ascontiguousarray(gaps, dtype=np.uint64), dtype=np.uint64)


def encode_postings(doc_ids: np.ndarray, tfs: np.ndarray) -> tuple[bytes, bytes]:
    """(sorted doc_ids, tfs) → (delta+varint doc bytes, varint tf bytes)."""
    return varint_encode(delta_encode(doc_ids)), varint_encode(tfs)


def decode_postings(doc_bytes: bytes, tf_bytes: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`encode_postings` → (doc_ids uint64, tfs uint64)."""
    return delta_decode(varint_decode(doc_bytes)), varint_decode(tf_bytes)


def block_metadata(
    doc_ids: np.ndarray,
    impacts: np.ndarray,
    block_size: int = DEFAULT_BLOCK_SIZE,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-block skip metadata for block-max WAND.

    ``impacts`` are fully-precomputed per-posting score contributions
    (idf * (k1+1) * tf / (tf + k1*(1 - b + b*dl/avgdl))), so the block max is
    a true upper bound on any document's contribution from this term within
    the block — the invariant block-max WAND pruning relies on.

    Returns (block_first_doc, block_last_doc, block_max_impact) arrays.
    """
    n = doc_ids.size
    if n == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z.copy(), np.empty(0, dtype=np.float64)
    starts = np.arange(0, n, block_size, dtype=np.int64)
    lasts = np.minimum(starts + block_size - 1, n - 1)
    block_first = doc_ids[starts].astype(np.int64)
    block_last = doc_ids[lasts].astype(np.int64)
    block_max = np.maximum.reduceat(impacts.astype(np.float64), starts)
    return block_first, block_last, block_max
