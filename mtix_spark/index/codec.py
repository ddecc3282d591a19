"""Delta + LEB128 varint posting-list codec, numpy-vectorized.

No per-row Python: encode/decode operate on whole numpy arrays with a fixed
number of vector passes (≤10, one per possible varint byte). This is the
compression layer for posting lists (BASELINE.json:north_star: "delta +
varint compression"), run inside applyInPandas during segment builds and
inside the query kernels during decode.

Layout: values are unsigned LEB128 — 7 payload bits per byte, high bit set on
continuation bytes. docID lists are delta-encoded first (first id absolute,
rest np.diff), which turns sorted 64-bit ids into mostly-1-byte varints.
"""

from __future__ import annotations

import numpy as np

_MAX_VARINT_BYTES = 10  # ceil(64/7)


def encode_varint_with_sizes(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """uint64 array -> (LEB128 byte stream, per-value byte counts).

    The byte counts let a caller slice one bulk-encoded stream into
    per-group binary cells by offset — the trick behind the fully-vectorized
    segment build (no per-term encode calls)."""
    arr = np.ascontiguousarray(values, dtype=np.uint64)
    if arr.size == 0:
        return b"", np.empty(0, dtype=np.int64)
    nb = np.ones(arr.size, dtype=np.int64)
    for k in range(1, _MAX_VARINT_BYTES):
        nb += (arr >= np.uint64(1) << np.uint64(7 * k)).astype(np.int64)
    offsets = np.zeros(arr.size, dtype=np.int64)
    np.cumsum(nb[:-1], out=offsets[1:])
    out = np.zeros(int(nb.sum()), dtype=np.uint8)
    for j in range(_MAX_VARINT_BYTES):
        mask = nb > j
        if not mask.any():
            break
        payload = (arr[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)
        cont = (nb[mask] > j + 1).astype(np.uint8) << 7
        out[offsets[mask] + j] = payload.astype(np.uint8) | cont
    return out.tobytes(), nb


def encode_varint(values: np.ndarray) -> bytes:
    """uint64 array -> LEB128 byte stream (vectorized)."""
    return encode_varint_with_sizes(values)[0]


def decode_varint(data: bytes | np.ndarray) -> np.ndarray:
    """LEB128 byte stream -> uint64 array (vectorized)."""
    buf = np.frombuffer(data, dtype=np.uint8) if isinstance(data, (bytes, bytearray)) else data
    if buf.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_end = (buf & 0x80) == 0
    # value index of each byte = number of terminators strictly before it
    vid = np.zeros(buf.size, dtype=np.int64)
    np.cumsum(is_end[:-1], out=vid[1:])
    n_values = int(is_end.sum())
    # byte position within its value
    starts = np.zeros(n_values, dtype=np.int64)
    ends_idx = np.flatnonzero(is_end)
    starts[1:] = ends_idx[:-1] + 1
    bytepos = np.arange(buf.size, dtype=np.int64) - starts[vid]
    contrib = (buf.astype(np.uint64) & np.uint64(0x7F)) << (
        np.uint64(7) * bytepos.astype(np.uint64)
    )
    out = np.zeros(n_values, dtype=np.uint64)
    np.add.at(out, vid, contrib)  # disjoint bit ranges -> add == or
    return out


def delta_encode(sorted_ids: np.ndarray) -> bytes:
    """Strictly-increasing uint64 ids -> varint(first, diffs...)."""
    ids = np.ascontiguousarray(sorted_ids, dtype=np.uint64)
    if ids.size == 0:
        return b""
    deltas = np.empty(ids.size, dtype=np.uint64)
    deltas[0] = ids[0]
    np.subtract(ids[1:], ids[:-1], out=deltas[1:])
    return encode_varint(deltas)


def delta_decode(data: bytes) -> np.ndarray:
    deltas = decode_varint(data)
    return np.cumsum(deltas, dtype=np.uint64)
