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
