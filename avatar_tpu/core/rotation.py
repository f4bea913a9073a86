"""SO(3) utilities: axis-angle / quaternion / rotation-matrix conversions.

Vectorized jnp implementations used by the LBS forward pass, the pose prior,
and the Gauss-Newton optimizer's tangent-space updates.  All functions accept
leading batch dimensions (they are written against the last axes only).

Reference semantics notes (for parity with sxyu/avatar):
  * Quaternion storage order is (x, y, z, w) matching Eigen's
    ``Quaterniond::coeffs()`` — this is the order used on disk by the
    CMU mocap ``.dat`` pose bank (reference AvatarPoseSequence.cpp:47-64).
  * ``so3_exp`` is the standard exponential map: ``so3_exp(v)`` rotates by
    angle ``|v|`` about axis ``v/|v|`` (reference uses Eigen::AngleAxis,
    e.g. Avatar.cpp:94-99).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12
_HI = jax.lax.Precision.HIGHEST


def skew(v):
    """[..., 3] -> [..., 3, 3] cross-product (hat) matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(v):
    """Axis-angle [..., 3] -> rotation matrix [..., 3, 3] (Rodrigues).

    Numerically safe at the origin (uses the sinc-style expansion).
    """
    theta2 = jnp.sum(v * v, axis=-1, keepdims=True)[..., None]  # [...,1,1]
    theta = jnp.sqrt(theta2 + _EPS)
    K = skew(v)
    K2 = jnp.matmul(K, K, precision=_HI)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=v.dtype), K.shape)
    # sin(t)/t and (1-cos(t))/t^2 with small-angle Taylor fallback
    use_taylor = theta2 < 1e-8
    a = jnp.where(use_taylor, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(use_taylor, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    return eye + a * K + b * K2


def so3_log(R):
    """Rotation matrix [..., 3, 3] -> axis-angle [..., 3].

    Matches Eigen's ``AngleAxisd::fromRotationMatrix`` result (angle in
    [0, pi]); used to export SMPL axis-angle params (Avatar.cpp:128-137).
    Safe near identity and near angle pi.
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    # Generic branch: v = theta/(2 sin theta) * vee(R - R^T)
    vee = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_theta = jnp.sin(theta)
    small = theta < 1e-5
    # Near pi the vee-based formula is ill-conditioned (arccos error blows up
    # theta/sin(theta) in f32) — switch to the diagonal formula early and
    # recover theta from |vee| = 2 sin(theta) there, which stays accurate.
    near_pi = theta > jnp.pi - 0.05
    # Small angle: v ~ 0.5 * vee * (1 + theta^2/6)
    scale_generic = theta / jnp.where(
        jnp.abs(2.0 * sin_theta) < _EPS, 1.0, 2.0 * sin_theta
    )
    scale_small = 0.5 + theta * theta / 12.0
    scale = jnp.where(small, scale_small, scale_generic)
    v_generic = vee * scale[..., None]
    # Near pi: use the diagonal formula. axis_i = sqrt((R_ii+1)/2), signs from
    # off-diagonals.
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis_abs = jnp.sqrt(jnp.clip((diag - cos_theta[..., None]) /
                                 (1.0 - cos_theta[..., None] + _EPS), 0.0, None))
    # Determine signs: pick largest axis component k, set sign(axis_k) = +;
    # sign(axis_i) = sign(R_ki + R_ik).
    k = jnp.argmax(axis_abs, axis=-1)
    Rt = R + jnp.swapaxes(R, -1, -2)

    def row_at(M, idx):
        return jnp.take_along_axis(M, idx[..., None, None].repeat(3, -1), axis=-2)[
            ..., 0, :
        ]

    rk = row_at(Rt, k)  # [..., 3] row k of R+R^T
    signs = jnp.where(rk >= 0, 1.0, -1.0)
    # sign of the k-th component itself must be +1
    sk = jnp.take_along_axis(signs, k[..., None], axis=-1)
    signs = signs * sk  # normalize so component k positive
    vee_norm = jnp.linalg.norm(vee, axis=-1)
    theta_pi = jnp.pi - jnp.arcsin(jnp.clip(vee_norm * 0.5, 0.0, 1.0))
    v_pi = axis_abs * signs * theta_pi[..., None]
    v = jnp.where(near_pi[..., None], v_pi, v_generic)
    return v


def quat_to_mat(q):
    """Quaternion [..., 4] in (x, y, z, w) order -> rotation matrix [..., 3, 3].

    Does not require the input to be normalized (normalizes internally),
    matching Eigen's toRotationMatrix on normalized quats.
    """
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(_EPS)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
        ],
        axis=-2,
    )


def mat_to_quat(R):
    """Rotation matrix [..., 3, 3] -> quaternion [..., 4], (x, y, z, w) order.

    Branch-free Shepperd's method (selects the numerically best of the four
    candidate formulations per element).  w >= 0 convention.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    # Four candidates (unnormalized), indexed by which diag term dominates
    qw = jnp.stack([1 + m00 + m11 + m22, 1 + m00 - m11 - m22,
                    1 - m00 + m11 - m22, 1 - m00 - m11 + m22], axis=-1)
    qw = jnp.clip(qw, _EPS, None)
    t = jnp.sqrt(qw)
    # candidate 0 (w major)
    c0 = jnp.stack([(m21 - m12), (m02 - m20), (m10 - m01), qw[..., 0]], axis=-1) / (
        2.0 * t[..., 0:1]
    )
    # candidate 1 (x major)
    c1 = jnp.stack([qw[..., 1], (m01 + m10), (m02 + m20), (m21 - m12)], axis=-1) / (
        2.0 * t[..., 1:2]
    )
    # candidate 2 (y major)
    c2 = jnp.stack([(m01 + m10), qw[..., 2], (m12 + m21), (m02 - m20)], axis=-1) / (
        2.0 * t[..., 2:3]
    )
    # candidate 3 (z major)
    c3 = jnp.stack([(m02 + m20), (m12 + m21), qw[..., 3], (m10 - m01)], axis=-1) / (
        2.0 * t[..., 3:4]
    )
    idx = jnp.argmax(qw, axis=-1)
    cands = jnp.stack([c0, c1, c2, c3], axis=-2)  # [..., 4cand, 4comp]
    q = jnp.take_along_axis(cands, idx[..., None, None].repeat(4, -1), axis=-2)[
        ..., 0, :
    ]
    # enforce w >= 0
    sgn = jnp.where(q[..., 3:4] < 0, -1.0, 1.0)
    q = q * sgn
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(_EPS)


def so3_left_jacobian_inv(v):
    """Inverse left Jacobian of SO(3) at axis-angle v: [..., 3] -> [..., 3, 3].

    J_l^{-1}(v) = I - v^/2 + (1/t^2 - (1+cos t)/(2 t sin t)) v^ v^.
    Used for the exact pose-prior Jacobian wrt the optimizer's tangent
    (the reference approximates this with identity,
    AvatarOptimizer.cpp:674-689).
    """
    theta2 = jnp.sum(v * v, axis=-1)[..., None, None]
    theta = jnp.sqrt(theta2 + _EPS)
    K = skew(v)
    K2 = jnp.matmul(K, K, precision=_HI)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=v.dtype), K.shape)
    use_taylor = theta2 < 1e-8
    # coefficient c = 1/t^2 - (1 + cos t)/(2 t sin t); Taylor: 1/12 + t^2/720
    c_generic = 1.0 / theta2.clip(_EPS) - (1.0 + jnp.cos(theta)) / (
        2.0 * theta * jnp.sin(theta) + _EPS
    )
    c = jnp.where(use_taylor, 1.0 / 12.0 + theta2 / 720.0, c_generic)
    return eye - 0.5 * K + c * K2


def from_spherical(rho, theta, phi):
    """Spherical -> rectangular, matching reference AvatarHelpers.cpp:55-59."""
    return jnp.stack(
        [
            rho * jnp.sin(phi) * jnp.cos(theta),
            rho * jnp.cos(phi),
            rho * jnp.sin(phi) * jnp.sin(theta),
        ],
        axis=-1,
    )
