"""LBS forward pass vs the independent numpy float64 oracle.

This is the rebuild's version of the reference's manual verification of
Avatar::update (the reference has no test suite; SURVEY.md section 4).
"""

import jax
import jax.numpy as jnp
import numpy as np

from avatar_tpu.core import rotation
from avatar_tpu.core.lbs import lbs, lbs_batched
from tests.ref_impl import lbs_reference


def _random_pose(model, rng, scale=0.6):
    J = model.num_joints()
    w = rng.normal(0, 1.0, model.num_shape_keys())
    p = rng.normal(0, 1.0, 3) + np.array([0, 0, 2.5])
    aa = rng.normal(0, scale, (J, 3))
    rots = np.asarray(rotation.so3_exp(jnp.asarray(aa)))
    return w, p, rots


def test_lbs_rest_pose(tiny_model):
    model = tiny_model
    w = np.zeros(model.num_shape_keys())
    p = np.zeros(3)
    rots = np.tile(np.eye(3), (model.num_joints(), 1, 1))
    cloud, joints, Rg, j_init = lbs(
        model.params, model.parents, jnp.asarray(w, jnp.float32),
        jnp.asarray(p, jnp.float32), jnp.asarray(rots, jnp.float32))
    # Root at p: pelvis joint is exactly p (non-standard root handling,
    # reference Avatar.cpp:47-49)
    np.testing.assert_allclose(np.asarray(joints)[0], p, atol=1e-6)
    # At rest pose, joints = rest joints shifted so pelvis sits at p
    expected = model.initial_joint_pos - model.initial_joint_pos[0] + p
    np.testing.assert_allclose(np.asarray(joints), expected, atol=1e-5)
    # Cloud = template shifted by the same amount
    expected_cloud = model.v_template - model.initial_joint_pos[0] + p
    np.testing.assert_allclose(np.asarray(cloud), expected_cloud, atol=1e-5)


def test_lbs_vs_reference_oracle(tiny_model, rng):
    model = tiny_model
    for trial in range(4):
        w, p, rots = _random_pose(model, rng)
        ref_cloud, ref_joints = lbs_reference(model, w, p, rots)
        cloud, joints, _, _ = lbs(
            model.params, model.parents, jnp.asarray(w, jnp.float32),
            jnp.asarray(p, jnp.float32), jnp.asarray(rots, jnp.float32))
        # float32 vs float64 oracle: must agree to well under 1 mm
        err = np.abs(np.asarray(cloud) - ref_cloud).max()
        assert err < 2e-4, f"vertex error {err * 1e3:.4f} mm"
        jerr = np.abs(np.asarray(joints) - ref_joints).max()
        assert jerr < 2e-4, f"joint error {jerr * 1e3:.4f} mm"


def test_lbs_batched_matches_single(tiny_model, rng):
    model = tiny_model
    B = 3
    ws, ps, rs = [], [], []
    for _ in range(B):
        w, p, rots = _random_pose(model, rng)
        ws.append(w)
        ps.append(p)
        rs.append(rots)
    ws, ps, rs = (jnp.asarray(np.stack(x), jnp.float32) for x in (ws, ps, rs))
    clouds, joints, _, _ = lbs_batched(model.params, model.parents, ws, ps, rs)
    for b in range(B):
        c1, j1, _, _ = lbs(model.params, model.parents, ws[b], ps[b], rs[b])
        np.testing.assert_allclose(np.asarray(clouds[b]), np.asarray(c1),
                                   atol=1e-6)


def test_lbs_jittable_and_differentiable(tiny_model, rng):
    """The LBS must be differentiable (the optimizer's Jacobians are checked
    against jax.jacfwd elsewhere)."""
    model = tiny_model
    w, p, rots = _random_pose(model, rng, scale=0.3)

    def loss(w_, p_):
        cloud, _, _, _ = lbs(model.params, model.parents, w_, p_,
                             jnp.asarray(rots, jnp.float32))
        return jnp.sum(cloud ** 2)

    g = jax.grad(loss, argnums=(0, 1))(
        jnp.asarray(w, jnp.float32), jnp.asarray(p, jnp.float32))
    assert np.all(np.isfinite(np.asarray(g[0])))
    assert np.all(np.isfinite(np.asarray(g[1])))
