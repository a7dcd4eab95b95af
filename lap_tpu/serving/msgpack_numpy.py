"""msgpack with numpy support, wire-compatible with the msgpack_numpy
convention used by openpi's websocket protocol (ndarray encoded as a map with
b"nd"/b"type"/b"kind"/b"shape"/b"data" keys)."""

from __future__ import annotations

import functools

import msgpack
import numpy as np


def _encode(obj):
    if isinstance(obj, np.ndarray):
        if obj.dtype == object:
            raise TypeError("object arrays are not serializable")
        if not obj.flags["C_CONTIGUOUS"]:
            obj = np.ascontiguousarray(obj)
        return {
            b"nd": True,
            b"type": obj.dtype.str,
            b"kind": b"",
            b"shape": list(obj.shape),
            b"data": obj.tobytes(),
        }
    if isinstance(obj, (np.bool_, np.number)):
        return {
            b"nd": False,
            b"type": obj.dtype.str,
            b"kind": b"",
            b"data": obj.tobytes(),
        }
    return obj


def _decode(obj):
    if b"nd" in obj:
        dtype = np.dtype(obj[b"type"])
        if obj[b"nd"]:
            return np.frombuffer(obj[b"data"], dtype=dtype).reshape(obj[b"shape"])
        return np.frombuffer(obj[b"data"], dtype=dtype)[0]
    return obj


packb = functools.partial(msgpack.packb, default=_encode, use_bin_type=True)
unpackb = functools.partial(
    msgpack.unpackb, object_hook=_decode, raw=False, strict_map_key=False
)

Packer = functools.partial(msgpack.Packer, default=_encode, use_bin_type=True)
Unpacker = functools.partial(
    msgpack.Unpacker, object_hook=_decode, raw=False, strict_map_key=False
)
