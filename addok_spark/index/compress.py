"""Delta + varint (PForDelta-style) posting-block codec.

The reference keeps posting lists as Redis sorted sets in RAM
(``/root/reference/addok/helpers/keys.py:1-5``); at 10^12-turn scale
posting lists must live in columnar storage, so blocks of postings
are delta-encoded (doc indexes are sorted) and varint-packed into
``binary`` columns (SURVEY.md §4.2 "Spill/compression"). Encode and
decode are numpy-vectorized (no per-value Python loops) so they run
inside Arrow pandas UDFs at full batch speed.
"""

from __future__ import annotations

import numpy as np

_SHIFTS = np.arange(10, dtype=np.uint64) * np.uint64(7)


def varint_encode_offsets(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """LEB128-encode a uint64 array (vectorized over byte lanes);
    also return the int64 cumulative byte offsets (length n+1, starting
    at 0) so callers can slice the buffer at any value boundary — the
    block packer encodes a whole Arrow batch in one call and cuts the
    result at posting-block boundaries."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b"", np.zeros(1, dtype=np.int64)
    # number of 7-bit groups per value
    nbits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    for _ in range(10):
        nbits += (tmp != 0).astype(np.int64)
        tmp >>= np.uint64(7)
    nbytes = np.maximum(nbits, 1)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    for j in range(10):
        mask = nbytes > j
        if not mask.any():
            break
        byte = ((v[mask] >> _SHIFTS[j]) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[mask] - 1) > j
        out[starts[mask] + j] = byte | (cont.astype(np.uint8) << 7)
    return out.tobytes(), np.concatenate((np.zeros(1, dtype=np.int64), ends))


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array (vectorized over byte lanes)."""
    return varint_encode_offsets(values)[0]


def varint_decode(buf: bytes) -> np.ndarray:
    """Decode LEB128 bytes → uint64 array (vectorized)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    last = (b & 0x80) == 0
    ends = np.flatnonzero(last)
    starts = np.concatenate(([0], ends[:-1] + 1))
    lens = ends - starts + 1
    pos = np.arange(b.size, dtype=np.int64) - np.repeat(starts, lens)
    contrib = (b & np.uint8(0x7F)).astype(np.uint64) << (
        pos.astype(np.uint64) * np.uint64(7)
    )
    return np.add.reduceat(contrib, starts)


def pack_deltas(sorted_values: np.ndarray) -> bytes:
    """Delta-encode a sorted uint64 array then varint-pack."""
    v = np.ascontiguousarray(sorted_values, dtype=np.uint64)
    if v.size == 0:
        return b""
    deltas = np.empty_like(v)
    deltas[0] = v[0]
    np.subtract(v[1:], v[:-1], out=deltas[1:])
    return varint_encode(deltas)


def unpack_deltas(buf: bytes) -> np.ndarray:
    return np.cumsum(varint_decode(buf), dtype=np.uint64)


def pack_f32(values: np.ndarray) -> bytes:
    return np.ascontiguousarray(values, dtype=np.float32).tobytes()


def unpack_f32(buf: bytes) -> np.ndarray:
    return np.frombuffer(buf, dtype=np.float32)
