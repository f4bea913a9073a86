"""Zero-run-length ``.depth`` codec (reference Util.cpp:176-247).

Stream layout: uint16 rows, uint16 cols, then float32 values row-major where
a negative value -n stands for a run of n zeros (runs may span row
boundaries) and non-negative values are literal depths.  A trailing zero run
is never written (the decoder zero-fills).

Dispatches to the compiled C++ extension when available (built by
avatar_tpu.native.build); the numpy implementation below is the reference
and fallback.
"""

from __future__ import annotations

import ctypes
import os
import struct

import numpy as np

_LIB = None


def _load_native():
    global _LIB
    if _LIB is not None:
        return _LIB
    here = os.path.dirname(os.path.abspath(__file__))
    for name in ("libavatar_native.so",):
        path = os.path.join(here, name)
        if os.path.exists(path):
            try:
                lib = ctypes.CDLL(path)
                lib.rle_decode.restype = ctypes.c_longlong
                lib.rle_decode.argtypes = [
                    ctypes.c_char_p, ctypes.c_longlong,
                    ctypes.POINTER(ctypes.c_float), ctypes.c_longlong,
                ]
                lib.rle_encode.restype = ctypes.c_longlong
                lib.rle_encode.argtypes = [
                    ctypes.POINTER(ctypes.c_float), ctypes.c_longlong,
                    ctypes.c_void_p, ctypes.c_longlong,
                ]
                _LIB = lib
                return lib
            except OSError:
                pass
    _LIB = False
    return False


def decode(data: bytes) -> np.ndarray:
    """Decode a ``.depth`` byte stream -> float32 [H, W]."""
    if len(data) < 4:
        raise ValueError("truncated .depth stream")
    rows, cols = struct.unpack_from("<HH", data, 0)
    n = rows * cols
    lib = _load_native()
    if lib:
        out = np.zeros(n, dtype=np.float32)
        wrote = lib.rle_decode(
            data, len(data),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
        )
        if wrote < 0:
            raise ValueError("corrupt .depth stream")
        return out.reshape(rows, cols)
    vals = np.frombuffer(data, dtype="<f4", offset=4)
    neg = vals < 0
    lengths = np.where(neg, (-vals).astype(np.int64), 1)
    pieces = np.where(neg, np.float32(0), vals)
    out_flat = np.repeat(pieces, lengths)
    out = np.zeros(n, dtype=np.float32)
    m = min(n, out_flat.shape[0])
    out[:m] = out_flat[:m]
    return out.reshape(rows, cols)


def encode(depth: np.ndarray) -> bytes:
    """Encode float32 [H, W] -> ``.depth`` byte stream."""
    depth = np.ascontiguousarray(depth, dtype=np.float32)
    rows, cols = depth.shape
    header = struct.pack("<HH", rows, cols)
    flat = depth.reshape(-1)
    lib = _load_native()
    if lib:
        # worst case: every element literal
        buf = np.zeros(flat.shape[0] + 1, dtype=np.float32)
        wrote = lib.rle_encode(
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), flat.shape[0],
            buf.ctypes.data, buf.nbytes,
        )
        return header + buf[: wrote].tobytes()
    # Vectorized run-length: find nonzero positions; the gap before each
    # nonzero becomes a -gap marker.
    nz = np.nonzero(flat)[0]
    if nz.shape[0] == 0:
        return header  # all zeros: empty stream (decoder zero-fills)
    gaps = np.diff(np.concatenate([[-1], nz])) - 1  # zeros before each nonzero
    vals = flat[nz]
    # Interleave: for each nonzero value, optionally a -gap then the value.
    has_gap = gaps > 0
    total = nz.shape[0] + int(has_gap.sum())
    stream = np.empty(total, dtype=np.float32)
    pos = np.cumsum(has_gap.astype(np.int64)) + np.arange(nz.shape[0])
    stream[pos] = vals
    stream[pos[has_gap] - 1] = -gaps[has_gap].astype(np.float32)
    return header + stream.tobytes()
