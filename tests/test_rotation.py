"""SO(3) utility tests: round-trips, known values, Jacobian identities."""

import jax.numpy as jnp
import numpy as np

from avatar_tpu.core import rotation


def test_exp_log_roundtrip(rng):
    v = rng.normal(0, 1.0, size=(64, 3))
    # include tiny and near-pi angles
    v[0] = [1e-9, 0, 0]
    v[1] = [0, 0, 0]
    v[2] = np.array([1.0, 0.2, -0.3])
    v[2] *= (np.pi - 1e-3) / np.linalg.norm(v[2])
    R = rotation.so3_exp(jnp.asarray(v))
    v2 = rotation.so3_log(R)
    R2 = rotation.so3_exp(v2)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=2e-5)
    # angles in [0, pi]: log should reproduce v when |v| <= pi
    norms = np.linalg.norm(v, axis=1)
    sel = norms < np.pi - 1e-2
    np.testing.assert_allclose(np.asarray(v2)[sel], v[sel], atol=1e-4)


def test_exp_known_value():
    # rotation by pi/2 about z
    v = jnp.asarray([0.0, 0.0, np.pi / 2])
    R = np.asarray(rotation.so3_exp(v))
    expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], float)
    np.testing.assert_allclose(R, expected, atol=1e-6)


def test_quat_mat_roundtrip(rng):
    q = rng.normal(size=(128, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    q *= np.where(q[:, 3:4] < 0, -1.0, 1.0)  # w >= 0 convention
    R = rotation.quat_to_mat(jnp.asarray(q))
    q2 = rotation.mat_to_quat(R)
    np.testing.assert_allclose(np.asarray(q2), q, atol=1e-5)


def test_quat_to_mat_matches_exp(rng):
    # quat (sin(t/2) axis, cos(t/2)) == exp(t axis)
    axis = rng.normal(size=(16, 3))
    axis /= np.linalg.norm(axis, axis=1, keepdims=True)
    t = rng.uniform(0, np.pi, size=(16, 1))
    q = np.concatenate([np.sin(t / 2) * axis, np.cos(t / 2)], axis=1)
    R1 = np.asarray(rotation.quat_to_mat(jnp.asarray(q)))
    R2 = np.asarray(rotation.so3_exp(jnp.asarray(axis * t)))
    np.testing.assert_allclose(R1, R2, atol=1e-5)


def test_left_jacobian_inverse_identity(rng):
    # d/d(delta) log(exp(delta^) exp(v^)) at 0 == J_l^{-1}(v)
    v = rng.normal(0, 0.8, size=(3,))
    J = np.asarray(rotation.so3_left_jacobian_inv(jnp.asarray(v)))
    eps = 3e-3  # central differences in float32: balance FD truncation vs rounding
    R0 = np.asarray(rotation.so3_exp(jnp.asarray(v)))
    J_fd = np.zeros((3, 3))
    for i in range(3):
        d = np.zeros(3)
        d[i] = eps
        Rp = np.asarray(rotation.so3_exp(jnp.asarray(d))) @ R0
        Rm = np.asarray(rotation.so3_exp(jnp.asarray(-d))) @ R0
        lp = np.asarray(rotation.so3_log(jnp.asarray(Rp)))
        lm = np.asarray(rotation.so3_log(jnp.asarray(Rm)))
        J_fd[:, i] = (lp - lm) / (2 * eps)
    np.testing.assert_allclose(J, J_fd, atol=5e-3)


def test_skew():
    v = jnp.asarray([1.0, 2.0, 3.0])
    K = np.asarray(rotation.skew(v))
    a = np.array([0.5, -1.0, 2.0])
    np.testing.assert_allclose(K @ a, np.cross([1, 2, 3], a), atol=1e-6)
