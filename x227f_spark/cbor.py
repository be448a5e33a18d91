"""Minimal CBOR (RFC 8949) encoder for the processed export (S4).

The reference writes ``88x31.cbor`` as ``serde_cbor::to_vec`` of the same
struct it JSON-serializes (processed.rs:228-230): a definite-length map of
text keys → arrays of ints / strings / nulls / nested arrays. This encoder
covers exactly that value domain (None, bool, int, str, bytes, list, dict)
with definite lengths — matching serde_cbor's default encoding choices —
so consumers of the reference's compact artifact can read ours.

No external cbor library is available in the container; the encoder is
~50 lines and deterministic (dict insertion order preserved, mirroring
serde's struct-field order).
"""

from __future__ import annotations

import struct


def _head(major: int, arg: int) -> bytes:
    if arg < 24:
        return bytes([(major << 5) | arg])
    if arg < 0x100:
        return bytes([(major << 5) | 24, arg])
    if arg < 0x10000:
        return bytes([(major << 5) | 25]) + struct.pack(">H", arg)
    if arg < 0x100000000:
        return bytes([(major << 5) | 26]) + struct.pack(">I", arg)
    return bytes([(major << 5) | 27]) + struct.pack(">Q", arg)


def _encode(obj, out: bytearray) -> None:
    if obj is None:
        out.append(0xF6)
    elif obj is True:
        out.append(0xF5)
    elif obj is False:
        out.append(0xF4)
    elif isinstance(obj, int):
        if obj >= 0:
            out += _head(0, obj)
        else:
            out += _head(1, -1 - obj)
    elif isinstance(obj, str):
        b = obj.encode("utf-8")
        out += _head(3, len(b))
        out += b
    elif isinstance(obj, (bytes, bytearray)):
        out += _head(2, len(obj))
        out += obj
    elif isinstance(obj, (list, tuple)):
        out += _head(4, len(obj))
        for v in obj:
            _encode(v, out)
    elif isinstance(obj, dict):
        out += _head(5, len(obj))
        for k, v in obj.items():
            _encode(k, out)
            _encode(v, out)
    elif isinstance(obj, float):
        out.append(0xFB)
        out += struct.pack(">d", obj)
    else:
        raise TypeError(f"cbor: unsupported type {type(obj)!r}")


def dumps(obj) -> bytes:
    out = bytearray()
    _encode(obj, out)
    return bytes(out)
