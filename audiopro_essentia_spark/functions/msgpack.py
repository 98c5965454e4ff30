"""Minimal MessagePack encoder/decoder (public spec, msgpack.org) for the
doc-metadata sink — the reference ships analysis blobs as msgpack/json
(/root/reference/src/audiopro/output/output_handler.py dispatch); this
container has no msgpack wheel, so the needed subset is implemented from
the published format: nil/bool/int/float64/str/bin/array/map.

Independent implementation from the spec — covers every type the
doc-metadata rows produce; unsupported types fail loud.
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
        if 0 <= o <= 0x7F:
            out.append(o)
        elif -32 <= o < 0:
            out.append(o & 0xFF)
        elif -(1 << 63) <= o < (1 << 63):
            out.append(0xD3)
            out += struct.pack(">q", o)
        elif 0 <= o < (1 << 64):
            out.append(0xCF)
            out += struct.pack(">Q", o)
        else:
            raise ValueError(f"int out of msgpack range: {o}")
    elif isinstance(o, float):
        out.append(0xCB)
        out += struct.pack(">d", o)
    elif isinstance(o, str):
        b = o.encode("utf-8")
        n = len(b)
        if n <= 31:
            out.append(0xA0 | n)
        elif n <= 0xFF:
            out += bytes((0xD9, n))
        elif n <= 0xFFFF:
            out.append(0xDA)
            out += struct.pack(">H", n)
        else:
            out.append(0xDB)
            out += struct.pack(">I", n)
        out += b
    elif isinstance(o, (bytes, bytearray)):
        n = len(o)
        if n <= 0xFF:
            out += bytes((0xC4, n))
        elif n <= 0xFFFF:
            out.append(0xC5)
            out += struct.pack(">H", n)
        else:
            out.append(0xC6)
            out += struct.pack(">I", n)
        out += bytes(o)
    elif isinstance(o, (list, tuple)):
        n = len(o)
        if n <= 15:
            out.append(0x90 | n)
        elif n <= 0xFFFF:
            out.append(0xDC)
            out += struct.pack(">H", n)
        else:
            out.append(0xDD)
            out += struct.pack(">I", n)
        for v in o:
            _pack(v, out)
    elif isinstance(o, dict):
        n = len(o)
        if n <= 15:
            out.append(0x80 | n)
        elif n <= 0xFFFF:
            out.append(0xDE)
            out += struct.pack(">H", n)
        else:
            out.append(0xDF)
            out += struct.pack(">I", n)
        for k, v in o.items():
            _pack(k, out)
            _pack(v, out)
    else:
        raise TypeError(f"unsupported msgpack type: {type(o).__name__}")


def unpackb(data: bytes) -> Any:
    try:
        v, i = _unpack(memoryview(data), 0)
    except (struct.error, IndexError) as e:
        # fixed-width/header reads past end-of-buffer surface as
        # struct.error/IndexError — normalize to the truncation contract
        raise ValueError(f"truncated msgpack data: {e}") from e
    if i != len(data):
        raise ValueError(f"trailing bytes after msgpack object: {len(data) - i}")
    return v


def unpack_stream(data: bytes) -> list[Any]:
    """Decode back-to-back msgpack objects (the sink's file layout)."""
    mv = memoryview(data)
    out, i = [], 0
    while i < len(mv):
        try:
            v, i = _unpack(mv, i)
        except (struct.error, IndexError) as e:
            raise ValueError(f"truncated msgpack data: {e}") from e
        out.append(v)
    return out


def _need(mv: memoryview, i: int, n: int) -> None:
    if i + n > len(mv):
        raise ValueError(
            f"truncated msgpack data: need {n} bytes at offset {i}, "
            f"have {len(mv) - i}"
        )


_MAX_DEPTH = 128  # nesting cap: recursion past this is corrupt/adversarial
# input, and uncapped recursion surfaces as RecursionError — outside the
# ValueError contract callers quarantine on


def _unpack(mv: memoryview, i: int, depth: int = 0):
    if depth > _MAX_DEPTH:
        raise ValueError(f"msgpack nesting deeper than {_MAX_DEPTH}")
    b = mv[i]
    i += 1
    if b <= 0x7F:
        return b, i
    if b >= 0xE0:
        return b - 0x100, i
    if 0xA0 <= b <= 0xBF:
        n = b & 0x1F
        _need(mv, i, n)
        return bytes(mv[i : i + n]).decode("utf-8"), i + n
    if 0x90 <= b <= 0x9F:
        return _unpack_array(mv, i, b & 0x0F, depth)
    if 0x80 <= b <= 0x8F:
        return _unpack_map(mv, i, b & 0x0F, depth)
    if b == 0xC0:
        return None, i
    if b == 0xC2:
        return False, i
    if b == 0xC3:
        return True, i
    if b == 0xCB:
        return struct.unpack_from(">d", mv, i)[0], i + 8
    if b == 0xCA:
        return struct.unpack_from(">f", mv, i)[0], i + 4
    if b == 0xD3:
        return struct.unpack_from(">q", mv, i)[0], i + 8
    if b == 0xCF:
        return struct.unpack_from(">Q", mv, i)[0], i + 8
    # full unsigned/signed int family — other writers emit minimal widths
    if b == 0xCC:
        return mv[i], i + 1
    if b == 0xCD:
        return struct.unpack_from(">H", mv, i)[0], i + 2
    if b == 0xCE:
        return struct.unpack_from(">I", mv, i)[0], i + 4
    if b == 0xD0:
        return struct.unpack_from(">b", mv, i)[0], i + 1
    if b == 0xD1:
        return struct.unpack_from(">h", mv, i)[0], i + 2
    if b == 0xD2:
        return struct.unpack_from(">i", mv, i)[0], i + 4
    if b == 0xD9:
        n = mv[i]
        _need(mv, i + 1, n)
        return bytes(mv[i + 1 : i + 1 + n]).decode("utf-8"), i + 1 + n
    if b == 0xDA:
        n = struct.unpack_from(">H", mv, i)[0]
        _need(mv, i + 2, n)
        return bytes(mv[i + 2 : i + 2 + n]).decode("utf-8"), i + 2 + n
    if b == 0xDB:
        n = struct.unpack_from(">I", mv, i)[0]
        _need(mv, i + 4, n)
        return bytes(mv[i + 4 : i + 4 + n]).decode("utf-8"), i + 4 + n
    if b == 0xC4:
        n = mv[i]
        _need(mv, i + 1, n)
        return bytes(mv[i + 1 : i + 1 + n]), i + 1 + n
    if b == 0xC5:
        n = struct.unpack_from(">H", mv, i)[0]
        _need(mv, i + 2, n)
        return bytes(mv[i + 2 : i + 2 + n]), i + 2 + n
    if b == 0xC6:
        n = struct.unpack_from(">I", mv, i)[0]
        _need(mv, i + 4, n)
        return bytes(mv[i + 4 : i + 4 + n]), i + 4 + n
    if b == 0xDC:
        n = struct.unpack_from(">H", mv, i)[0]
        return _unpack_array(mv, i + 2, n, depth)
    if b == 0xDD:
        n = struct.unpack_from(">I", mv, i)[0]
        return _unpack_array(mv, i + 4, n, depth)
    if b == 0xDE:
        n = struct.unpack_from(">H", mv, i)[0]
        return _unpack_map(mv, i + 2, n, depth)
    if b == 0xDF:
        n = struct.unpack_from(">I", mv, i)[0]
        return _unpack_map(mv, i + 4, n, depth)
    raise ValueError(f"unsupported msgpack byte: 0x{b:02x}")


def _unpack_array(mv, i, n, depth=0):
    out = []
    for _ in range(n):
        v, i = _unpack(mv, i, depth + 1)
        out.append(v)
    return out, i


def _unpack_map(mv, i, n, depth=0):
    out = {}
    for _ in range(n):
        k, i = _unpack(mv, i, depth + 1)
        if not isinstance(k, (str, int, float, bool, bytes, type(None))):
            # spec-legal but unusable: an array/map key is unhashable in
            # Python and would escape as TypeError — fail the contract way
            raise ValueError(
                f"unsupported msgpack map key type: {type(k).__name__}"
            )
        v, i = _unpack(mv, i, depth + 1)
        out[k] = v
    return out, i
