"""Minimal pure-Python MessagePack codec (spec: msgpack.org — public).

The reference plans msgpack as its wire format between `udlift | udlang |
udlower` (README.md:53-61, TBD at README.md:96); the container ships no
msgpack library, so this implements the needed subset directly: nil, bool,
int (all widths), float64 (float32 decode-only), str, bin, array, map.

Scale shape: the codec runs inside Arrow-batched Python stages
(mapInPandas) — decode is per-frame and embarrassingly parallel across
files/partitions; there is no cross-record state in the framing (each
frame is one complete value), so a byte stream can be split at frame
boundaries and scanned in parallel once frame offsets are known (here:
one file per partition via binaryFile, the simple variant).

Encoding is canonical-smallest (ints pack into the narrowest form), so
pack(unpack(x)) is byte-stable for round-trip tests.
"""

from __future__ import annotations

import struct
from typing import Any


def packb(obj: Any) -> bytes:
    out = bytearray()
    _pack(obj, out)
    return bytes(out)


def _pack(o: Any, out: bytearray) -> None:
    if o is None:
        out.append(0xC0)
    elif o is True:
        out.append(0xC3)
    elif o is False:
        out.append(0xC2)
    elif isinstance(o, int):
        _pack_int(o, out)
    elif isinstance(o, float):
        out.append(0xCB)
        out += struct.pack(">d", o)
    elif isinstance(o, str):
        b = o.encode("utf-8")
        n = len(b)
        if n <= 31:
            out.append(0xA0 | n)
        elif n < 2**8:
            out += struct.pack(">BB", 0xD9, n)
        elif n < 2**16:
            out += struct.pack(">BH", 0xDA, n)
        else:
            out += struct.pack(">BI", 0xDB, n)
        out += b
    elif isinstance(o, (bytes, bytearray)):
        n = len(o)
        if n < 2**8:
            out += struct.pack(">BB", 0xC4, n)
        elif n < 2**16:
            out += struct.pack(">BH", 0xC5, n)
        else:
            out += struct.pack(">BI", 0xC6, n)
        out += o
    elif isinstance(o, (list, tuple)):
        n = len(o)
        if n <= 15:
            out.append(0x90 | n)
        elif n < 2**16:
            out += struct.pack(">BH", 0xDC, n)
        else:
            out += struct.pack(">BI", 0xDD, n)
        for v in o:
            _pack(v, out)
    elif isinstance(o, dict):
        n = len(o)
        if n <= 15:
            out.append(0x80 | n)
        elif n < 2**16:
            out += struct.pack(">BH", 0xDE, n)
        else:
            out += struct.pack(">BI", 0xDF, n)
        for k, v in o.items():
            _pack(k, out)
            _pack(v, out)
    else:
        raise TypeError(f"msgpack: unsupported type {type(o).__name__}")


def _pack_int(i: int, out: bytearray) -> None:
    if 0 <= i <= 0x7F:
        out.append(i)
    elif -32 <= i < 0:
        out.append(i & 0xFF)
    elif 0 < i < 2**8:
        out += struct.pack(">BB", 0xCC, i)
    elif 0 < i < 2**16:
        out += struct.pack(">BH", 0xCD, i)
    elif 0 < i < 2**32:
        out += struct.pack(">BI", 0xCE, i)
    elif 0 < i < 2**64:
        out += struct.pack(">BQ", 0xCF, i)
    elif -(2**7) <= i < 0:
        out += struct.pack(">Bb", 0xD0, i)
    elif -(2**15) <= i < 0:
        out += struct.pack(">Bh", 0xD1, i)
    elif -(2**31) <= i < 0:
        out += struct.pack(">Bi", 0xD2, i)
    elif -(2**63) <= i < 0:
        out += struct.pack(">Bq", 0xD3, i)
    else:
        raise OverflowError("msgpack: int out of 64-bit range")


def unpackb(data: bytes) -> Any:
    """Decode exactly one value; error on trailing bytes."""
    v, pos = _unpack(data, 0)
    if pos != len(data):
        raise ValueError(f"msgpack: {len(data) - pos} trailing bytes")
    return v


def unpack_stream(data: bytes) -> list[Any]:
    """Decode a concatenation of frames (the udlift|udlang pipe format)."""
    out, pos = [], 0
    while pos < len(data):
        v, pos = _unpack(data, pos)
        out.append(v)
    return out


def _take(b: bytes, p: int, n: int) -> tuple[bytes, int]:
    """Slice n payload bytes, REFUSING truncation: b[p:p+n] would silently
    shorten a str/bin whose declared length runs past the buffer."""
    if p + n > len(b):
        raise ValueError(
            f"msgpack: truncated payload (need {n} bytes at {p}, have {len(b) - p})"
        )
    return b[p : p + n], p + n


def _unpack(b: bytes, p: int) -> tuple[Any, int]:
    t = b[p]
    p += 1
    if t <= 0x7F:
        return t, p
    if t >= 0xE0:
        return t - 256, p
    if 0x80 <= t <= 0x8F:
        return _unpack_map(b, p, t & 0x0F)
    if 0x90 <= t <= 0x9F:
        return _unpack_arr(b, p, t & 0x0F)
    if 0xA0 <= t <= 0xBF:
        raw, p = _take(b, p, t & 0x1F)
        return raw.decode("utf-8"), p
    if t == 0xC0:
        return None, p
    if t == 0xC2:
        return False, p
    if t == 0xC3:
        return True, p
    if t in (0xC4, 0xC5, 0xC6):
        w = {0xC4: ">B", 0xC5: ">H", 0xC6: ">I"}[t]
        n = struct.unpack_from(w, b, p)[0]
        raw, p = _take(b, p + struct.calcsize(w), n)
        return bytes(raw), p
    if t == 0xCA:
        return struct.unpack_from(">f", b, p)[0], p + 4
    if t == 0xCB:
        return struct.unpack_from(">d", b, p)[0], p + 8
    if t in (0xCC, 0xCD, 0xCE, 0xCF):
        w = {0xCC: ">B", 0xCD: ">H", 0xCE: ">I", 0xCF: ">Q"}[t]
        return struct.unpack_from(w, b, p)[0], p + struct.calcsize(w)
    if t in (0xD0, 0xD1, 0xD2, 0xD3):
        w = {0xD0: ">b", 0xD1: ">h", 0xD2: ">i", 0xD3: ">q"}[t]
        return struct.unpack_from(w, b, p)[0], p + struct.calcsize(w)
    if t in (0xD9, 0xDA, 0xDB):
        w = {0xD9: ">B", 0xDA: ">H", 0xDB: ">I"}[t]
        n = struct.unpack_from(w, b, p)[0]
        raw, p = _take(b, p + struct.calcsize(w), n)
        return raw.decode("utf-8"), p
    if t in (0xDC, 0xDD):
        w = ">H" if t == 0xDC else ">I"
        n = struct.unpack_from(w, b, p)[0]
        return _unpack_arr(b, p + struct.calcsize(w), n)
    if t in (0xDE, 0xDF):
        w = ">H" if t == 0xDE else ">I"
        n = struct.unpack_from(w, b, p)[0]
        return _unpack_map(b, p + struct.calcsize(w), n)
    raise ValueError(f"msgpack: unsupported type byte 0x{t:02x} (ext types not needed)")


def _unpack_arr(b: bytes, p: int, n: int) -> tuple[list, int]:
    out = []
    for _ in range(n):
        v, p = _unpack(b, p)
        out.append(v)
    return out, p


def _unpack_map(b: bytes, p: int, n: int) -> tuple[dict, int]:
    out = {}
    for _ in range(n):
        k, p = _unpack(b, p)
        v, p = _unpack(b, p)
        out[k] = v
    return out, p
