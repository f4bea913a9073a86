"""Byte-level interop: parse committed reference-format fixture files.

The fixtures under tests/fixtures/ were hand-assembled with struct.pack
directly from the C++ writers' byte layouts (scripts/make_interop_fixtures.py
documents each layout against reference file:line) — none were produced by
this repo's writers.  Every expected value below is a literal derived from
the C++ byte layout, so a reader bug mirrored in the repo's writer cannot
hide behind a self-round-trip.
"""

import math
import os

import numpy as np

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def test_srtr_binary_fixture():
    # layout: RTree.cpp:3063-3094 (see scripts/make_interop_fixtures.py)
    from avatar_tpu.io.formats import read_srtr

    fd = read_srtr(os.path.join(FIX, "ref_tree.srtr"))
    assert fd.num_nodes == 3
    assert fd.num_parts == 3
    # node 0 internal
    assert fd.leafid[0] == -1
    assert fd.lnode[0] == 1 and fd.rnode[0] == 2
    assert fd.thresh[0] == np.float32(0.5)
    np.testing.assert_array_equal(fd.u[0], [1.5, -2.0])
    np.testing.assert_array_equal(fd.v[0], [0.25, 3.0])
    # leaves (leaf ids assigned in node order)
    assert fd.leafid[1] == 0 and fd.leafid[2] == 1
    np.testing.assert_array_equal(fd.leaf_data[0], [0.75, 0.0, 0.25])
    np.testing.assert_array_equal(fd.leaf_data[1], [0.0, 1.0, 0.0])


def test_srtr_legacy_text_fixture():
    # layout: RTree.cpp:3017-3047
    from avatar_tpu.io.formats import read_srtr

    fd = read_srtr(os.path.join(FIX, "ref_tree_legacy.srtr"))
    assert fd.num_nodes == 3 and fd.num_parts == 3
    assert fd.leafid[0] == -1
    assert fd.lnode[0] == 1 and fd.rnode[0] == 2
    np.testing.assert_array_equal(fd.u[0], [1.5, -2.0])
    np.testing.assert_array_equal(fd.v[0], [0.25, 3.0])
    assert fd.leafid[1] == 0 and fd.leafid[2] == 1
    np.testing.assert_array_equal(fd.leaf_data[0], [0.75, 0.0, 0.25])
    np.testing.assert_array_equal(fd.leaf_data[1], [0.0, 1.0, 0.0])


def test_partmap_fixture():
    # layout: RTree.cpp:3465-3509.  The pair rows are deliberately NOT in
    # src declaration order — the reader must map through the name enums.
    from avatar_tpu.io.formats import PARTMAP_CONTIGUOUS, read_partmap

    pm, n_new, pm_type = read_partmap(
        os.path.join(FIX, "ref_tree.srtr.partmap"))
    assert pm_type == PARTMAP_CONTIGUOUS
    # src order: head torso lhand rhand; dest order: upper(0) lower(1)
    assert list(pm) == [0, 1, 0, 1]


def test_depth_rle_fixture():
    # layout: Util.cpp:176-209 (reader) / 219-247 (writer; trailing zero
    # run intentionally unflushed in the fixture)
    from avatar_tpu.io.formats import read_depth_rle

    img = read_depth_rle(os.path.join(FIX, "ref_frame.depth"))
    expected = np.array([[1.5, 0.0, 0.0, 2.5],
                         [0.0, 3.25, 4.0, 0.0],
                         [0.0, 0.0, 0.0, 0.0]], np.float32)
    np.testing.assert_array_equal(img, expected)


def test_mocap_fixture():
    # layout: AvatarPoseSequence.cpp:10-45; quaternion coeffs are in
    # Eigen coeffs() order x,y,z,w (AvatarPoseSequence.cpp:53-57)
    from avatar_tpu.core.sequence import AvatarPoseSequence

    seq = AvatarPoseSequence(os.path.join(FIX, "ref_mocap.dat"))
    assert seq.num_frames == 2
    assert seq.frame_size == 11
    assert seq.subsequences == {"walk": 0, "run": 1}

    f0 = seq.get_frame(0)
    np.testing.assert_allclose(f0[:3], [0.5, -0.25, 2.0])
    s = math.sqrt(0.5)
    np.testing.assert_allclose(f0[3:7], [0.0, 0.0, 0.0, 1.0])
    np.testing.assert_allclose(f0[7:11], [0.0, 0.0, s, s])

    # rotation decoding: quat (x,y,z,w) -> matrix, via a tiny stub avatar
    class _StubModel:
        @staticmethod
        def num_joints():
            return 2

    class _Stub:
        model = _StubModel()
        p = np.zeros(3)
        r = np.zeros((2, 3, 3))

    ava = _Stub()
    seq.pose_avatar(ava, 1)
    np.testing.assert_allclose(ava.p, [1.0, 0.0, 2.5])
    # 90 deg about +x
    np.testing.assert_allclose(
        ava.r[0], [[1, 0, 0], [0, 0, -1], [0, 1, 0]], atol=1e-6)
    # 180 deg about +y
    np.testing.assert_allclose(
        ava.r[1], [[-1, 0, 0], [0, 1, 0], [0, 0, -1]], atol=1e-6)
