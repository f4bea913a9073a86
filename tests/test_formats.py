"""Codec round-trip tests: .depth RLE, .srtr, .partmap, intrin.txt, mocap."""

import os

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


def test_intrin_reads_reference_artifact():
    """Parse the genuine reference-produced intrin.txt (Azure Kinect K4A
    calibration committed with sxyu/avatar), including every distortion
    coefficient.

    This is the only true cross-implementation artifact available: it was
    written by the reference's ``CameraIntrin::writeFile``
    (Calibration.cpp:97-112) from a real device calibration. Tags are
    0-based (k0..k5, p0 p1) — see io/calibration.py's module docstring for
    the reference reader's own off-by-one, which we deliberately do not
    reproduce.
    """
    path = os.path.join(os.path.dirname(__file__), "fixtures",
                        "ref_intrin.txt")
    intr = CameraIntrin.from_file(path)
    assert abs(intr.fx - 606.438) < 1e-9
    assert abs(intr.cx - 637.294) < 1e-9
    assert abs(intr.fy - 606.351) < 1e-9
    assert abs(intr.cy - 366.992) < 1e-9
    np.testing.assert_allclose(
        intr.k, [0.777798, -2.93384, 1.6463, 0.655163, -2.76696, 1.57894],
        rtol=0, atol=1e-12)
    np.testing.assert_allclose(
        intr.p, [0.000662754, 6.69302e-05], rtol=0, atol=1e-12)


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


def test_rtree_v3_checkpoint_round_trip(tmp_path):
    """Byte-level round trip of the reference RTREE_V3 trainer checkpoint
    (RTree.cpp:2649-2779)."""
    from avatar_tpu.io.formats import (ForestData, RTreeV3State,
                                       read_rtree_v3, write_rtree_v3,
                                       trainer_checkpoint_to_forest)

    rng = np.random.default_rng(3)
    n, P = 7, 5
    fd = ForestData(
        rng.normal(size=(n, 2)).astype(np.float32),
        rng.normal(size=(n, 2)).astype(np.float32),
        rng.normal(size=n).astype(np.float32),
        np.array([1, 3, -1, 5, -1, -1, -1], np.int32),
        np.array([2, 4, -1, 6, -1, -1, -1], np.int32),
        np.array([-1, -1, 0, -1, 1, -1, -1], np.int32),
        rng.dirichlet(np.ones(P), size=2).astype(np.float32), P)
    ns = 11
    st = RTreeV3State(
        num_parts=P,
        source=dict(kind="avatar", xor_key=12345,
                    seq=np.arange(6, dtype=np.int32)),
        nodes=fd, node_interval=rng.integers(0, 100, (n, 2)).astype(np.uint64),
        leaf_data=fd.leaf_data,
        sample_index=rng.integers(0, 6, ns).astype(np.int32),
        sample_pix=rng.integers(0, 128, (ns, 2)).astype(np.int16),
        sample_label=rng.integers(0, P, ns).astype(np.uint8))
    path = str(tmp_path / "ckpt.rtree_v3")
    write_rtree_v3(path, st)
    # marker exactly as the C++ reader expects
    assert open(path, "rb").read(9) == b"RTREE_V3 "
    back = read_rtree_v3(path)
    assert back.num_parts == P
    assert back.source["xor_key"] == 12345
    np.testing.assert_array_equal(back.source["seq"], st.source["seq"])
    np.testing.assert_allclose(back.nodes.u, fd.u)
    np.testing.assert_allclose(back.nodes.thresh, fd.thresh)
    np.testing.assert_array_equal(back.nodes.leafid, fd.leafid)
    np.testing.assert_array_equal(back.node_interval, st.node_interval)
    np.testing.assert_array_equal(back.sample_index, st.sample_index)
    np.testing.assert_array_equal(back.sample_pix, st.sample_pix)
    np.testing.assert_array_equal(back.sample_label, st.sample_label)
    # conversion: frontier nodes (5, 6) get uniform leaves; tree walkable
    conv = trainer_checkpoint_to_forest(back)
    assert (conv.leafid >= 0).sum() == 4
    np.testing.assert_allclose(conv.leaf_data.sum(1), 1.0, atol=1e-5)


def test_rtree_v2_checkpoint_reader(tmp_path):
    """Parse a V2 checkpoint built byte-for-byte like the C++ writer
    (RTree.cpp:1964-2022)."""
    import struct

    from avatar_tpu.io.formats import read_rtree_v2

    P = 3
    buf = b"RTREE_V2 " + struct.pack("<i", P)
    # AvatarDataSource: marker, sentinel, xorKey, seq
    buf += b"SRC_AVATAR" + struct.pack("<Q", 0xFFFFFFFFFFFFFFFF)
    buf += struct.pack("<I", 777) + struct.pack("<Q", 2)
    buf += struct.pack("<ii", 4, 9)
    buf += struct.pack("<?", True)          # needInitTraining
    buf += struct.pack("<ii", 12, 1)        # depth, currStartNode
    buf += struct.pack("<Q", 1) + struct.pack("<Q", 2)  # sparse: 1 list of 2
    buf += struct.pack("<QQ", 10, 20)
    buf += struct.pack("<Q", 2) + struct.pack("<ii", 0, 1)  # assignedNode
    # one node
    buf += struct.pack("<Q", 1)
    buf += struct.pack("<fffff", 1.0, 2.0, 3.0, 4.0, 0.5)
    buf += struct.pack("<iii", -1, -1, 0)
    # one leaf
    buf += struct.pack("<Q", 1) + struct.pack("<fff", 0.2, 0.3, 0.5)
    # samples grouped by image: 3 total; img 0 has 2, img 1 has 1
    buf += b"S\n" + struct.pack("<Q", 3)
    buf += struct.pack("<ii", 0, 2) + struct.pack("<hhhh", 1, 2, 3, 4)
    buf += struct.pack("<ii", 1, 1) + struct.pack("<hh", 5, 6)
    path = tmp_path / "ckpt.rtree_v2"
    path.write_bytes(buf)
    st = read_rtree_v2(str(path))
    assert st.num_parts == P and st.need_init and st.depth == 12
    assert st.source["xor_key"] == 777
    np.testing.assert_array_equal(st.source["seq"], [4, 9])
    assert len(st.sparse) == 1
    np.testing.assert_array_equal(st.sparse[0], [10, 20])
    np.testing.assert_array_equal(st.assigned_node, [0, 1])
    assert st.nodes.num_nodes == 1 and st.nodes.leafid[0] == 0
    np.testing.assert_allclose(st.leaf_data[0], [0.2, 0.3, 0.5])
    np.testing.assert_array_equal(st.sample_index, [0, 0, 1])
    np.testing.assert_array_equal(st.sample_pix, [[1, 2], [3, 4], [5, 6]])


def test_rtree_loads_trainer_checkpoint(tmp_path):
    from avatar_tpu.io.formats import (ForestData, RTreeV3State,
                                       write_rtree_v3)
    from avatar_tpu.perception.rtree import RTree

    P = 4
    fd = ForestData(
        np.zeros((3, 2), np.float32), np.ones((3, 2), np.float32),
        np.zeros(3, np.float32),
        np.array([1, -1, -1], np.int32), np.array([2, -1, -1], np.int32),
        np.array([-1, 0, -1], np.int32),
        np.full((1, P), 0.25, np.float32), P)
    st = RTreeV3State(P, dict(kind="avatar", xor_key=1,
                              seq=np.zeros(1, np.int32)),
                      fd, np.zeros((3, 2), np.uint64), fd.leaf_data,
                      np.zeros(0, np.int32), np.zeros((0, 2), np.int16),
                      np.zeros(0, np.uint8))
    path = str(tmp_path / "c.rtree_v3")
    write_rtree_v3(path, st)
    tree = RTree(P)
    state = tree.load_trainer_checkpoint(path)
    assert state.num_parts == P
    assert tree.forest.num_nodes == 3
    assert (tree.forest.leafid >= 0).sum() == 2  # node 2 got a uniform leaf


def test_rtree_v2_checkpoint_round_trip(tmp_path):
    """write_rtree_v2 -> read_rtree_v2 round trip, and the writer's bytes
    must equal the hand-packed C++-layout fixture for the same state
    (writer-side byte compatibility, like the V3 test above)."""
    import struct

    from avatar_tpu.io.formats import (ForestData, RTreeV2State,
                                       read_rtree_v2, write_rtree_v2)

    P = 3
    fd = ForestData(
        u=np.array([[1.0, 2.0]], np.float32),
        v=np.array([[3.0, 4.0]], np.float32),
        thresh=np.array([0.5], np.float32),
        lnode=np.array([-1], np.int32), rnode=np.array([-1], np.int32),
        leafid=np.array([0], np.int32),
        leaf_data=np.array([[0.2, 0.3, 0.5]], np.float32), num_parts=P)
    st = RTreeV2State(
        num_parts=P,
        source=dict(kind="avatar", xor_key=777,
                    seq=np.array([4, 9], np.int32)),
        need_init=True, depth=12, curr_start_node=1,
        sparse=[np.array([10, 20], np.uint64)],
        assigned_node=np.array([0, 1], np.int32),
        nodes=fd, leaf_data=fd.leaf_data,
        sample_index=np.array([0, 0, 1], np.int32),
        sample_pix=np.array([[1, 2], [3, 4], [5, 6]], np.int16))
    path = str(tmp_path / "rt.rtree_v2")
    write_rtree_v2(path, st)

    # byte-level: identical to the hand-packed reference layout
    buf = b"RTREE_V2 " + struct.pack("<i", P)
    buf += b"SRC_AVATAR" + struct.pack("<Q", 0xFFFFFFFFFFFFFFFF)
    buf += struct.pack("<I", 777) + struct.pack("<Q", 2)
    buf += struct.pack("<ii", 4, 9)
    buf += struct.pack("<?", True)
    buf += struct.pack("<ii", 12, 1)
    buf += struct.pack("<Q", 1) + struct.pack("<Q", 2)
    buf += struct.pack("<QQ", 10, 20)
    buf += struct.pack("<Q", 2) + struct.pack("<ii", 0, 1)
    buf += struct.pack("<Q", 1)
    buf += struct.pack("<fffff", 1.0, 2.0, 3.0, 4.0, 0.5)
    buf += struct.pack("<iii", -1, -1, 0)
    buf += struct.pack("<Q", 1) + struct.pack("<fff", 0.2, 0.3, 0.5)
    buf += b"S\n" + struct.pack("<Q", 3)
    buf += struct.pack("<ii", 0, 2) + struct.pack("<hhhh", 1, 2, 3, 4)
    buf += struct.pack("<ii", 1, 1) + struct.pack("<hh", 5, 6)
    assert open(path, "rb").read() == buf

    back = read_rtree_v2(path)
    assert back.num_parts == P and back.need_init and back.depth == 12
    assert back.curr_start_node == 1
    assert back.source["xor_key"] == 777
    np.testing.assert_array_equal(back.source["seq"], [4, 9])
    np.testing.assert_array_equal(back.assigned_node, st.assigned_node)
    np.testing.assert_array_equal(back.sample_index, st.sample_index)
    np.testing.assert_array_equal(back.sample_pix, st.sample_pix)
    np.testing.assert_allclose(back.nodes.thresh, fd.thresh)
    np.testing.assert_allclose(back.leaf_data, fd.leaf_data)
