"""Codec round-trip tests: .depth RLE, .srtr, .partmap, intrin.txt, mocap."""

import numpy as np
import pytest

from avatar_tpu.io import formats
from avatar_tpu.io.calibration import CameraIntrin
from avatar_tpu.native import rle


def test_rle_roundtrip(rng, tmp_path):
    depth = np.zeros((37, 53), np.float32)
    mask = rng.random((37, 53)) < 0.3
    depth[mask] = rng.random(mask.sum()).astype(np.float32) * 5 + 0.1
    # long zero run spanning rows
    depth[10:14] = 0
    path = str(tmp_path / "x.depth")
    formats.write_depth_rle(path, depth)
    out = formats.read_depth_rle(path)
    np.testing.assert_array_equal(out, depth)


def test_rle_all_zero(tmp_path):
    depth = np.zeros((8, 9), np.float32)
    data = rle.encode(depth)
    assert len(data) == 4  # header only: trailing run is not flushed
    np.testing.assert_array_equal(rle.decode(data), depth)


def test_rle_trailing_zeros(tmp_path):
    depth = np.zeros((4, 4), np.float32)
    depth[0, 0] = 1.5
    data = rle.encode(depth)
    out = rle.decode(data)
    np.testing.assert_array_equal(out, depth)


def test_rle_dense(rng):
    depth = (rng.random((16, 16)) + 0.5).astype(np.float32)
    np.testing.assert_array_equal(rle.decode(rle.encode(depth)), depth)


def test_srtr_roundtrip(rng, tmp_path):
    n_nodes, num_parts = 15, 6
    # complete binary tree of depth 3: 7 internal, 8 leaves
    leafid = np.full(n_nodes, -1, np.int32)
    lnode = np.full(n_nodes, -1, np.int32)
    rnode = np.full(n_nodes, -1, np.int32)
    for i in range(7):
        lnode[i] = 2 * i + 1
        rnode[i] = 2 * i + 2
    leaf_i = 0
    for i in range(7, 15):
        leafid[i] = leaf_i
        leaf_i += 1
    u = rng.normal(size=(n_nodes, 2)).astype(np.float32)
    v = rng.normal(size=(n_nodes, 2)).astype(np.float32)
    thresh = rng.normal(size=n_nodes).astype(np.float32)
    leaf_data = rng.random((8, num_parts)).astype(np.float32)
    leaf_data[leaf_data < 0.3] = 0  # sparse leaves
    leaf_data /= leaf_data.sum(axis=1, keepdims=True).clip(1e-9)
    fd = formats.ForestData(u, v, thresh, lnode, rnode, leafid, leaf_data,
                            num_parts)
    path = str(tmp_path / "t.srtr")
    formats.write_srtr(path, fd)
    fd2 = formats.read_srtr(path)
    assert fd2.num_parts == num_parts
    internal = leafid < 0
    np.testing.assert_allclose(fd2.u[internal], u[internal])
    np.testing.assert_allclose(fd2.v[internal], v[internal])
    np.testing.assert_allclose(fd2.thresh[internal], thresh[internal])
    np.testing.assert_array_equal(fd2.lnode, lnode)
    np.testing.assert_array_equal(fd2.leafid, leafid)
    np.testing.assert_allclose(fd2.leaf_data, leaf_data, atol=1e-7)


def test_partmap_parse(tmp_path):
    text = """partmap contiguous
src 3
A B C
dest 2
X Y
A X
B Y
C X
"""
    p = tmp_path / "m.partmap"
    p.write_text(text)
    mapping, n_new, pm_type = formats.read_partmap(str(p))
    assert mapping == [0, 1, 0]
    assert n_new == 2
    assert pm_type == formats.PARTMAP_CONTIGUOUS


def test_intrin_roundtrip(tmp_path):
    intr = CameraIntrin(fx=606.438, fy=606.351, cx=637.294, cy=366.992,
                        k=(0.1, 0.0, 0.05, 0.0, 0.0, 0.0), p=(0.01, 0.0))
    path = str(tmp_path / "intrin.txt")
    intr.write_file(path)
    intr2 = CameraIntrin.from_file(path)
    assert abs(intr2.fx - intr.fx) < 1e-4
    assert abs(intr2.cy - intr.cy) < 1e-4
    assert abs(intr2.k[0] - 0.1) < 1e-9
    assert abs(intr2.k[2] - 0.05) < 1e-9
    assert abs(intr2.p[0] - 0.01) < 1e-9


def test_intrin_projection_inverse():
    import jax.numpy as jnp

    intr = CameraIntrin(fx=600.0, fy=600.0, cx=320.0, cy=240.0)
    pts2d = jnp.asarray([[10.0, 20.0], [320.0, 240.0], [600.0, 400.0]])
    depth = jnp.asarray([1.0, 2.0, 3.5])
    xyz = intr.to_3d(pts2d, depth)
    back = intr.to_2d(xyz)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts2d), atol=1e-4)


def test_depth_to_xyz_matches_reference_convention():
    intr = CameraIntrin(fx=600.0, fy=590.0, cx=32.0, cy=24.0)
    depth = np.zeros((48, 64), np.float32)
    depth[24, 32] = 2.0
    depth[10, 5] = 1.5
    xyz = np.asarray(intr.depth_to_xyz(np.asarray(depth)))
    # principal point maps to x = y = 0
    np.testing.assert_allclose(xyz[24, 32], [0, 0, 2.0], atol=1e-6)
    # reference Calibration.cpp:91: x=(c-cx)z/fx, y=(r-cy)z/fy
    np.testing.assert_allclose(
        xyz[10, 5],
        [(5 - 32.0) * 1.5 / 600.0, (10 - 24.0) * 1.5 / 590.0, 1.5], atol=1e-6)


def test_intrin_from_xyz_recovers(rng):
    from avatar_tpu.io.calibration import intrin_from_xyz

    intr = CameraIntrin(fx=606.4, fy=590.2, cx=120.7, cy=80.3)
    depth = (rng.uniform(0.5, 4.0, (160, 240))).astype(np.float32)
    depth[rng.uniform(size=depth.shape) < 0.3] = 0.0  # holes
    xyz = intr.depth_to_xyz_np(depth)
    rec = intrin_from_xyz(xyz)
    np.testing.assert_allclose(
        [rec.fx, rec.fy, rec.cx, rec.cy],
        [intr.fx, intr.fy, intr.cx, intr.cy], rtol=1e-4)


def test_pose_sequence_roundtrip(tmp_path, rng):
    from avatar_tpu.core.sequence import AvatarPoseSequence

    F, J = 10, 24
    pos = rng.normal(size=(F, 3))
    q = rng.normal(size=(F, J, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    path = str(tmp_path / "seq.dat")
    AvatarPoseSequence.write(path, pos, q)
    seq = AvatarPoseSequence(path)
    assert seq.num_frames == F
    assert seq.frame_size == 3 + J * 4
    frame = seq.get_frame(3)
    np.testing.assert_allclose(frame[:3], pos[3], atol=1e-12)
    np.testing.assert_allclose(frame[3:7], q[3, 0], atol=1e-12)
    seq.preload()
    np.testing.assert_allclose(seq.get_frame(7)[:3], pos[7], atol=1e-12)
