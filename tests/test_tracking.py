"""End-to-end tracking over a synthetic rendered sequence, plus dataset IO."""

import numpy as np
import pytest

import jax.numpy as jnp

from avatar_tpu.core import rotation
from avatar_tpu.core.model import Avatar
from avatar_tpu.io.calibration import CameraIntrin
from avatar_tpu.io.dataset import Dataset, DatasetWriter
from avatar_tpu.render.renderer import AvatarRenderer
from avatar_tpu.testing import synthetic_model
from avatar_tpu.tracking import Tracker, TrackerConfig

INTRIN = CameraIntrin(fx=220.0, fy=220.0, cx=128.0, cy=128.0)
H = W = 256


@pytest.fixture(scope="module")
def sequence():
    """Short smooth synthetic sequence: list of (xyz, labels, gt_joints)."""
    model = synthetic_model(detail=2)
    gt = Avatar(model)
    gt.randomize(seed=77)
    gt.w *= 0.3
    gt.p = np.array([0.0, 0.1, 2.6])
    gt.r[0] = np.array([[-1.0, 0, 0], [0, 1.0, 0], [0, 0, -1.0]])
    rng = np.random.default_rng(8)
    drift = rng.normal(0, 0.02, (24, 3))
    frames = []
    for t in range(6):
        gt.update()
        rend = AvatarRenderer(gt, INTRIN)
        depth = rend.render_depth((H, W))
        mask = rend.render_part_mask((H, W))
        xyz = np.asarray(INTRIN.depth_to_xyz_np(depth))
        xyz[..., 1] = xyz[..., 1]  # camera-space y (image-down); tracker flips
        frames.append((xyz, mask, gt.joint_pos.copy(), gt.cloud.copy()))
        # advance the pose smoothly
        step = np.asarray(rotation.so3_exp(jnp.asarray(drift, jnp.float32)))
        gt.r = np.einsum("jab,jbc->jac", step, gt.r)
        gt.p = gt.p + rng.normal(0, 0.01, 3)
    return model, frames


def test_tracking_sequence(sequence):
    model, frames = sequence
    cfg = TrackerConfig(data_interval=4, min_points=200,
                        frame_icp_iters=3, reinit_icp_iters=8,
                        initial_icp_iters=8)
    tracker = Tracker(model, INTRIN, (H, W), config=cfg)
    errs = []
    for i, (xyz, mask, gt_joints, gt_cloud) in enumerate(frames):
        res = tracker.track(xyz, labels_override=mask)
        assert res.ok, f"tracking lost at frame {i} ({res.n_points} pts)"
        assert res.reinitialized == (i == 0)
        err = np.linalg.norm(tracker.ava.joint_pos - gt_joints, axis=1).mean()
        errs.append(err)
    # locked on through the whole sequence: bounded error, no blow-up
    assert max(errs) < 0.08, f"joint error too high: {np.round(errs, 3)}"


def test_tracking_loss_and_reinit(sequence):
    model, frames = sequence
    cfg = TrackerConfig(data_interval=4, min_points=200)
    tracker = Tracker(model, INTRIN, (H, W), config=cfg)
    xyz, mask = frames[0][0], frames[0][1]
    assert tracker.track(xyz, labels_override=mask).ok
    # empty scene -> loss -> reinit flag
    empty = np.zeros_like(xyz)
    res = tracker.track(empty, labels_override=np.full((H, W), 255, np.uint8))
    assert not res.ok
    assert tracker.reinit
    res2 = tracker.track(xyz, labels_override=mask)
    assert res2.ok and res2.reinitialized


def test_tracker_with_background_subtraction(sequence):
    model, frames = sequence
    xyz, mask = frames[0][0], frames[0][1]
    # background: flat wall at 4 m
    bg = np.zeros_like(xyz)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    bg[..., 2] = 4.0
    bg[..., 0] = (xx - INTRIN.cx) * 4.0 / INTRIN.fx
    bg[..., 1] = (yy - INTRIN.cy) * 4.0 / INTRIN.fy
    scene = bg.copy()
    fg = xyz[..., 2] > 0
    scene[fg] = xyz[fg]

    cfg = TrackerConfig(data_interval=4, min_points=200)
    tracker = Tracker(model, INTRIN, (H, W), config=cfg)
    tracker.set_background(bg)
    res = tracker.track(scene, labels_override=mask)
    assert res.ok
    assert res.n_points > 50


def test_render_overlay(sequence):
    model, frames = sequence
    cfg = TrackerConfig(data_interval=4, min_points=200)
    tracker = Tracker(model, INTRIN, (H, W), config=cfg)
    assert tracker.track(frames[0][0], labels_override=frames[0][1]).ok
    rgb = np.full((H, W, 3), 60, np.uint8)
    overlay = tracker.render_overlay(rgb)
    assert overlay.shape == (H, W, 3)
    assert (overlay != 60).any()


def test_dataset_roundtrip(tmp_path, sequence):
    model, frames = sequence
    root = str(tmp_path / "ds")
    wr = DatasetWriter(root, INTRIN, pad=8)
    for i, (xyz, mask, gt_joints, _) in enumerate(frames[:2]):
        wr.write_depth(i, xyz[..., 2])
        wr.write_part_mask(i, mask)
        wr.write_joints(i, np.zeros((24, 2)), gt_joints,
                        np.zeros(3), np.zeros(10), np.zeros(72),
                        np.zeros(69))
    ds = Dataset(root, pad=8)
    assert ds.has_frame(0) and ds.has_frame(1) and not ds.has_frame(2)
    depth = ds.depth(0)
    np.testing.assert_allclose(depth, frames[0][0][..., 2], atol=1e-5)
    xyz = ds.xyz(0)
    fgm = depth > 0
    np.testing.assert_allclose(xyz[fgm], frames[0][0][fgm], atol=1e-4)
    mask = ds.part_mask(0)
    np.testing.assert_array_equal(mask, frames[0][1])
    j = ds.joints(0)
    assert j is not None
    np.testing.assert_allclose(j["joints_xyz"], frames[0][2], atol=1e-5)
