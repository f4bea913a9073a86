"""ASF/AMC loader tests on a small synthetic Acclaim file pair."""

import numpy as np
import pytest

from avatar_tpu.io.vicon import ViconSkeleton

ASF = """# test skeleton
:version 1.10
:name VICON
:units
  mass 1.0
  length 0.45
  angle deg
:root
   order TX TY TZ RX RY RZ
   axis XYZ
   position 0 0 0
   orientation 0 0 0
:bonedata
  begin
     id 1
     name upper
     direction 0 1 0
     length 2.0
     axis 0 0 0  XYZ
    dof rx ry rz
    limits (-180.0 180.0)
           (-180.0 180.0)
           (-180.0 180.0)
  end
  begin
     id 2
     name lower
     direction 0 1 0
     length 1.0
     axis 0 0 0  XYZ
    dof rx
    limits (-180.0 180.0)
  end
:hierarchy
  begin
    root upper
    upper lower
  end
"""

AMC = """#!OML:ASF
:FULLY-SPECIFIED
:DEGREES
1
root 0 0 0 0 0 0
upper 0 0 0
lower 0
2
root 1 2 3 0 0 90
upper 0 0 0
lower 90
"""


@pytest.fixture()
def skel(tmp_path):
    asf = tmp_path / "t.asf"
    amc = tmp_path / "t.amc"
    asf.write_text(ASF)
    amc.write_text(AMC)
    return ViconSkeleton(str(asf), str(amc), length_scale=1.0)


def test_parse_structure(skel):
    assert set(skel.bones) == {"upper", "lower"}
    assert skel.bones["lower"].parent == "upper"
    assert skel.num_frames == 2


def test_rest_pose_positions(skel):
    pos = skel.joint_positions(-1)
    np.testing.assert_allclose(pos["root"], [0, 0, 0], atol=1e-9)
    np.testing.assert_allclose(pos["upper"], [0, 2, 0], atol=1e-9)
    np.testing.assert_allclose(pos["lower"], [0, 3, 0], atol=1e-9)


def test_frame_zero_matches_rest(skel):
    pos = skel.joint_positions(0)
    np.testing.assert_allclose(pos["upper"], [0, 2, 0], atol=1e-9)
    np.testing.assert_allclose(pos["lower"], [0, 3, 0], atol=1e-9)


def test_posed_frame(skel):
    pos = skel.joint_positions(1)
    # root rotated 90 deg about z and translated (1,2,3): bone (0,1,0)
    # becomes (-1,0,0) scaled by lengths
    np.testing.assert_allclose(pos["root"], [1, 2, 3], atol=1e-9)
    np.testing.assert_allclose(pos["upper"], [-1, 2, 3], atol=1e-7)
    # lower additionally rotates 90 deg about its local x: (0,1,0)->(0,0,1),
    # then through the root's 90-deg z rotation
    np.testing.assert_allclose(pos["lower"], [-1, 2, 4], atol=1e-7)


def test_smpl_joint_export(skel, tmp_path):
    arr = skel.smpl_joints(1)
    assert arr.shape == (24, 3)
    assert np.isfinite(arr[0]).all()  # root mapped
    # unmapped joints are NaN
    assert np.isnan(arr[4]).any() or np.isfinite(arr).all()

# -- joint-op API (ViconSkeleton.h:36-74 spec; frame nav .cpp:253-310) --------


def test_frame_navigation(skel):
    skel.rest()
    assert skel.cur_frame == 0
    np.testing.assert_allclose(skel.pos["lower"], [0, 3, 0], atol=1e-9)
    assert skel.next_frame()          # -> frame 1 (1-based; AMC frame 0)
    assert skel.cur_frame == 1
    np.testing.assert_allclose(skel.pos["lower"], [0, 3, 0], atol=1e-9)
    assert skel.next_frame()          # -> frame 2 (the posed one)
    np.testing.assert_allclose(skel.pos["lower"], [-1, 2, 4], atol=1e-7)
    assert not skel.next_frame()      # past the end without loop
    assert skel.next_frame(1, loop=True)
    assert skel.cur_frame == 1
    assert skel.prev_frame(1, loop=True)
    assert skel.cur_frame == 2


def test_translate_subtree(skel):
    skel.rest()
    skel.translate("upper", [1.0, 0.0, 0.0])
    np.testing.assert_allclose(skel.pos["upper"], [1, 2, 0], atol=1e-9)
    np.testing.assert_allclose(skel.pos["lower"], [1, 3, 0], atol=1e-9)
    np.testing.assert_allclose(skel.pos["root"], [0, 0, 0], atol=1e-9)


def test_local_pos_and_length(skel):
    skel.rest()
    np.testing.assert_allclose(skel.local_pos("lower"), [0, 1, 0],
                               atol=1e-9)
    assert skel.bone_length("upper") == pytest.approx(2.0)
    skel.set_local_pos("lower", [0.0, 2.0, 0.0])
    np.testing.assert_allclose(skel.pos["lower"], [0, 4, 0], atol=1e-9)


def test_rotate_about_parent(skel):
    skel.rest()
    # rotate the lower bone 90 deg about z around its parent (upper @ (0,2,0))
    Rz = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    skel.rotate("lower", Rz)
    np.testing.assert_allclose(skel.pos["lower"], [-1, 2, 0], atol=1e-9)
    # root rotation is a no-op
    before = {k: v.copy() for k, v in skel.pos.items()}
    skel.rotate("root", Rz)
    for k in before:
        np.testing.assert_allclose(skel.pos[k], before[k], atol=1e-12)


def test_rotate_to_direction(skel):
    skel.rest()
    skel.rotate_to("upper", [1.0, 0.0, 0.0])
    np.testing.assert_allclose(skel.pos["upper"], [2, 0, 0], atol=1e-9)
    # subtree carried: lower keeps its local offset, rotated the same way
    np.testing.assert_allclose(skel.pos["lower"], [3, 0, 0], atol=1e-9)
    assert skel.bone_length("upper") == pytest.approx(2.0)  # pure rotation


def test_scale_one_translates_children(skel):
    skel.rest()
    skel.scale_one("upper", 2.0)
    np.testing.assert_allclose(skel.pos["upper"], [0, 4, 0], atol=1e-9)
    # child bone NOT scaled, just carried
    assert skel.bone_length("lower") == pytest.approx(1.0)
    np.testing.assert_allclose(skel.pos["lower"], [0, 5, 0], atol=1e-9)


def test_scale_subtree(skel):
    skel.rest()
    skel.scale("upper", 2.0)
    np.testing.assert_allclose(skel.pos["upper"], [0, 4, 0], atol=1e-9)
    np.testing.assert_allclose(skel.pos["lower"], [0, 6, 0], atol=1e-9)
    assert skel.bone_length("lower") == pytest.approx(2.0)


def test_rotate_and_scale_exact(skel):
    skel.rest()
    skel.rotate_and_scale("lower", [0.5, 0.0, 0.0])
    np.testing.assert_allclose(skel.local_pos("lower"), [0.5, 0, 0],
                               atol=1e-9)


def test_smpl_joints_from_posed_state(skel):
    skel.load_frame(2)
    arr = skel.smpl_joints(None)
    np.testing.assert_allclose(arr[0], [1, 2, 3], atol=1e-7)
