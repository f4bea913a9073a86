"""Native C++ helper parity tests (build on demand; skip without g++)."""

import shutil
import subprocess

import numpy as np
import pytest

from avatar_tpu.native import rle


@pytest.fixture(scope="module", autouse=True)
def built():
    if rle._load_native():
        return True
    if shutil.which("g++") is None:
        pytest.skip("no g++; native helpers unavailable")
    from avatar_tpu.native.build import build

    build(verbose=False)
    rle._LIB = None
    assert rle._load_native()
    return True


def test_rle_native_matches_python(rng):
    depth = np.zeros((64, 80), np.float32)
    m = rng.random((64, 80)) < 0.4
    depth[m] = (rng.random(m.sum()) * 4 + 0.2).astype(np.float32)
    native_bytes = rle.encode(depth)
    lib = rle._LIB
    try:
        rle._LIB = False
        py_bytes = rle.encode(depth)
        assert native_bytes == py_bytes
        np.testing.assert_array_equal(rle.decode(native_bytes), depth)
    finally:
        rle._LIB = lib
    np.testing.assert_array_equal(rle.decode(native_bytes), depth)


def test_host_cc_matches_device_kernel(rng):
    import jax.numpy as jnp

    from avatar_tpu.native.labeling import connected_components_host
    from avatar_tpu.perception import cc

    H, W = 48, 64
    act = rng.random((H, W)) < 0.55
    vals = rng.integers(0, 3, (H, W)).astype(np.uint8)
    host = connected_components_host(act, vals)
    dev = np.asarray(cc.connected_components(
        jnp.asarray(act), values=jnp.asarray(vals), max_iters=256))
    np.testing.assert_array_equal(host, dev)


def test_batch_decode(rng):
    import ctypes

    lib = rle._load_native()
    lib.depth_batch_decode.restype = None
    lib.depth_batch_decode.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_longlong), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_longlong, ctypes.c_int]
    imgs = []
    bufs = []
    for k in range(5):
        d = np.zeros((16, 20), np.float32)
        m = rng.random((16, 20)) < 0.3
        d[m] = (rng.random(m.sum()) + 0.1).astype(np.float32)
        imgs.append(d)
        bufs.append(rle.encode(d))
    data = b"".join(bufs)
    offsets = np.zeros(6, np.int64)
    offsets[1:] = np.cumsum([len(b) for b in bufs])
    out = np.zeros((5, 16 * 20), np.float32)
    lib.depth_batch_decode(
        data, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)), 5,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), 16 * 20, 4)
    for k in range(5):
        np.testing.assert_array_equal(out[k].reshape(16, 20), imgs[k])
