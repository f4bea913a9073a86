"""AvatarModel loading + Avatar state API tests."""

import numpy as np
import pytest

from avatar_tpu.core.model import Avatar, AvatarModel, SmplJoint
from avatar_tpu.testing import (synthetic_model, synthetic_pose_sequence,
                                write_synthetic_model_dir)


def test_model_shapes(tiny_model):
    m = tiny_model
    assert m.num_joints() == 24
    assert m.num_shape_keys() == 10
    assert m.num_points() > 500
    assert m.has_mesh()
    assert m.parent[0] == -1
    # weights rows sum to 1
    np.testing.assert_allclose(m.weights_np.sum(axis=1), 1.0, atol=1e-9)
    # joint regressor reproduces rest joints from the template
    np.testing.assert_allclose(m.joint_reg_np @ m.v_template,
                               m.initial_joint_pos, atol=1e-6)


def test_npz_loading_path(tmp_path):
    d = write_synthetic_model_dir(str(tmp_path / "model"))
    m = AvatarModel(d)
    m_direct = synthetic_model(detail=1)
    assert m.num_points() == m_direct.num_points()
    np.testing.assert_allclose(m.v_template, m_direct.v_template, atol=1e-12)
    np.testing.assert_allclose(m.weights_np, m_direct.weights_np, atol=1e-12)
    np.testing.assert_allclose(m.joint_shape_reg_base,
                               m_direct.joint_shape_reg_base, atol=1e-9)
    assert m.pose_prior is not None
    assert m.pose_prior.n_comps == m_direct.pose_prior.n_comps
    np.testing.assert_allclose(
        np.asarray(m.pose_prior.means), np.asarray(m_direct.pose_prior.means),
        atol=1e-6)


def test_avatar_update_and_randomize(tiny_model):
    ava = Avatar(tiny_model)
    ava.update()
    assert ava.cloud.shape == (tiny_model.num_points(), 3)
    assert ava.joint_pos.shape == (24, 3)
    rest_cloud = ava.cloud.copy()

    ava.randomize(seed=123)
    ava.update()
    assert not np.allclose(ava.cloud, rest_cloud)
    # root position within the randomization box (Avatar.cpp:103-109)
    assert -1.0 <= ava.p[0] <= 1.0
    assert 2.2 <= ava.p[2] <= 4.5
    # determinism
    ava2 = Avatar(tiny_model)
    ava2.randomize(seed=123)
    np.testing.assert_allclose(ava2.p, ava.p)
    np.testing.assert_allclose(ava2.r, ava.r)


def test_smpl_params_roundtrip(tiny_model):
    import jax.numpy as jnp

    from avatar_tpu.core import rotation

    ava = Avatar(tiny_model)
    ava.randomize(seed=7)
    params = ava.smpl_params()
    assert params.shape == (23 * 3,)
    mats = np.asarray(rotation.so3_exp(jnp.asarray(params.reshape(23, 3))))
    np.testing.assert_allclose(mats, ava.r[1:], atol=1e-5)


def test_pdf_runs(tiny_model):
    ava = Avatar(tiny_model)
    ava.randomize(seed=3)
    val = ava.pdf()
    assert np.isfinite(val) and val >= 0


def test_align_to_joints(tiny_model):
    ava = Avatar(tiny_model)
    ava.randomize(seed=5)
    ava.update()
    target_joints = ava.joint_pos.copy()
    target_r = ava.r.copy()

    ava2 = Avatar(tiny_model)
    ava2.align_to_joints(target_joints)
    ava2.update()
    # heuristic: joints should be much closer than rest pose
    rest = Avatar(tiny_model)
    rest.p = target_joints[0]
    rest.update()
    err_aligned = np.linalg.norm(ava2.joint_pos - target_joints, axis=1).mean()
    err_rest = np.linalg.norm(rest.joint_pos - target_joints, axis=1).mean()
    assert err_aligned < err_rest * 0.7


def test_pose_sequence_drives_avatar(tiny_model, tmp_path):
    from avatar_tpu.core.sequence import AvatarPoseSequence

    path = str(tmp_path / "seq.dat")
    synthetic_pose_sequence(path, n_frames=8)
    seq = AvatarPoseSequence(path)
    ava = Avatar(tiny_model)
    seq.pose_avatar(ava, 3)
    ava.update()
    assert np.isfinite(ava.cloud).all()
    # rotation matrices are orthonormal
    RtR = np.einsum("jab,jac->jbc", ava.r, ava.r)
    np.testing.assert_allclose(RtR, np.tile(np.eye(3), (24, 1, 1)), atol=1e-5)
