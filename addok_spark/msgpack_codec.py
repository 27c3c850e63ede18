"""Minimal pure-Python MessagePack codec (public spec,
https://github.com/msgpack/msgpack/blob/master/spec.md).

The environment ships no msgpack package, so the S2 source
(reference ``addok/helpers/__init__.py:25-30`` streams a file of
concatenated msgpack objects) is backed by this decoder instead. It
covers the full core format — nil/bool/int/float/str/bin/array/map —
and rejects ext types explicitly. The encoder exists for tests and
round-trip tooling.

Performance note: this is a SOURCE-decode path (one pass per input
file at ingest), not a query hot path; the per-record Python cost is
the same order as any msgpack binding's object building.
"""

from __future__ import annotations

import struct
from typing import Any, Iterator


class MsgpackError(ValueError):
    pass


def _read(buf: memoryview, pos: int, n: int) -> tuple[memoryview, int]:
    if pos + n > len(buf):
        raise MsgpackError(f"truncated msgpack data at byte {pos}")
    return buf[pos : pos + n], pos + n


def _decode_one(buf: memoryview, pos: int) -> tuple[Any, int]:
    head, pos = _read(buf, pos, 1)
    b = head[0]
    if b <= 0x7F:  # positive fixint
        return b, pos
    if b >= 0xE0:  # negative fixint
        return b - 0x100, pos
    if 0x80 <= b <= 0x8F:  # fixmap
        return _decode_map(buf, pos, b & 0x0F)
    if 0x90 <= b <= 0x9F:  # fixarray
        return _decode_array(buf, pos, b & 0x0F)
    if 0xA0 <= b <= 0xBF:  # fixstr
        raw, pos = _read(buf, pos, b & 0x1F)
        return str(raw, "utf-8"), pos
    if b == 0xC0:
        return None, pos
    if b == 0xC2:
        return False, pos
    if b == 0xC3:
        return True, pos
    if b in (0xC4, 0xC5, 0xC6):  # bin8/16/32
        n, pos = _decode_uint(buf, pos, 1 << (b - 0xC4))
        raw, pos = _read(buf, pos, n)
        return bytes(raw), pos
    if b == 0xCA:
        raw, pos = _read(buf, pos, 4)
        return struct.unpack(">f", raw)[0], pos
    if b == 0xCB:
        raw, pos = _read(buf, pos, 8)
        return struct.unpack(">d", raw)[0], pos
    if 0xCC <= b <= 0xCF:  # uint8/16/32/64
        return _decode_uint(buf, pos, 1 << (b - 0xCC))
    if 0xD0 <= b <= 0xD3:  # int8/16/32/64
        n = 1 << (b - 0xD0)
        raw, pos = _read(buf, pos, n)
        return int.from_bytes(raw, "big", signed=True), pos
    if b in (0xD9, 0xDA, 0xDB):  # str8/16/32
        n, pos = _decode_uint(buf, pos, 1 << (b - 0xD9))
        raw, pos = _read(buf, pos, n)
        return str(raw, "utf-8"), pos
    if b in (0xDC, 0xDD):  # array16/32
        n, pos = _decode_uint(buf, pos, 2 << (b - 0xDC))
        return _decode_array(buf, pos, n)
    if b in (0xDE, 0xDF):  # map16/32
        n, pos = _decode_uint(buf, pos, 2 << (b - 0xDE))
        return _decode_map(buf, pos, n)
    raise MsgpackError(f"unsupported msgpack type byte 0x{b:02x}")


def _decode_uint(buf: memoryview, pos: int, n: int) -> tuple[int, int]:
    raw, pos = _read(buf, pos, n)
    return int.from_bytes(raw, "big"), pos


def _decode_array(buf: memoryview, pos: int, n: int) -> tuple[list, int]:
    out = []
    for _ in range(n):
        v, pos = _decode_one(buf, pos)
        out.append(v)
    return out, pos


def _decode_map(buf: memoryview, pos: int, n: int) -> tuple[dict, int]:
    out = {}
    for _ in range(n):
        k, pos = _decode_one(buf, pos)
        v, pos = _decode_one(buf, pos)
        out[k] = v
    return out, pos


def unpack_stream(data: bytes) -> Iterator[Any]:
    """Iterate concatenated msgpack objects (the reference's
    ``msgpack.Unpacker`` file-stream shape)."""
    buf = memoryview(data)
    pos = 0
    while pos < len(buf):
        obj, pos = _decode_one(buf, pos)
        yield obj


def packb(obj: Any) -> bytes:
    """Encode one object (tests / tooling)."""
    if obj is None:
        return b"\xc0"
    if obj is True:
        return b"\xc3"
    if obj is False:
        return b"\xc2"
    if isinstance(obj, int):
        if 0 <= obj <= 0x7F:
            return bytes([obj])
        if -32 <= obj < 0:
            return bytes([obj & 0xFF])
        for code, fmt, lo, hi in (
            (0xCC, ">B", 0, 0xFF),
            (0xCD, ">H", 0, 0xFFFF),
            (0xCE, ">I", 0, 0xFFFFFFFF),
            (0xCF, ">Q", 0, (1 << 64) - 1),
            (0xD0, ">b", -0x80, 0x7F),
            (0xD1, ">h", -0x8000, 0x7FFF),
            (0xD2, ">i", -(1 << 31), (1 << 31) - 1),
            (0xD3, ">q", -(1 << 63), (1 << 63) - 1),
        ):
            if lo <= obj <= hi:
                return bytes([code]) + struct.pack(fmt, obj)
        raise MsgpackError("int out of 64-bit range")
    if isinstance(obj, float):
        return b"\xcb" + struct.pack(">d", obj)
    if isinstance(obj, str):
        raw = obj.encode("utf-8")
        n = len(raw)
        if n <= 31:
            return bytes([0xA0 | n]) + raw
        if n <= 0xFF:
            return b"\xd9" + bytes([n]) + raw
        if n <= 0xFFFF:
            return b"\xda" + struct.pack(">H", n) + raw
        return b"\xdb" + struct.pack(">I", n) + raw
    if isinstance(obj, (bytes, bytearray)):
        n = len(obj)
        if n <= 0xFF:
            return b"\xc4" + bytes([n]) + bytes(obj)
        if n <= 0xFFFF:
            return b"\xc5" + struct.pack(">H", n) + bytes(obj)
        return b"\xc6" + struct.pack(">I", n) + bytes(obj)
    if isinstance(obj, (list, tuple)):
        n = len(obj)
        if n <= 15:
            head = bytes([0x90 | n])
        elif n <= 0xFFFF:
            head = b"\xdc" + struct.pack(">H", n)
        else:
            head = b"\xdd" + struct.pack(">I", n)
        return head + b"".join(packb(v) for v in obj)
    if isinstance(obj, dict):
        n = len(obj)
        if n <= 15:
            head = bytes([0x80 | n])
        elif n <= 0xFFFF:
            head = b"\xde" + struct.pack(">H", n)
        else:
            head = b"\xdf" + struct.pack(">I", n)
        return head + b"".join(packb(k) + packb(v) for k, v in obj.items())
    raise MsgpackError(f"cannot encode {type(obj).__name__}")
