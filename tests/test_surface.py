"""Point-to-mesh correspondence (optim/surface.py) + the converged-fit
exactness gate (BASELINE.md "<1 mm fitted-mesh vertex RMSE").

The gate test reproduces bench.py's fit_rmse_mm probe at the quick
configuration: render a ground-truth frame, start the solver AT the ground
truth with oracle labels, and assert the refined fit does not drift more
than 1 mm off the true mesh.  Any regression in the solver, the surface
correspondence, or the robust weighting fails this loudly (VERDICT round 2:
"the <1 mm target has no test").
"""

import numpy as np
import pytest

import jax.numpy as jnp


def test_closest_point_triangle_regions():
    from avatar_tpu.optim.surface import closest_point_triangle

    a = jnp.asarray([0.0, 0.0, 0.0])
    b = jnp.asarray([1.0, 0.0, 0.0])
    c = jnp.asarray([0.0, 1.0, 0.0])

    cases = [
        # (query point, expected closest point)
        ([0.25, 0.25, 1.0], [0.25, 0.25, 0.0]),   # interior, above plane
        ([-1.0, -1.0, 0.5], [0.0, 0.0, 0.0]),     # vertex a region
        ([2.0, -0.5, 0.0], [1.0, 0.0, 0.0]),      # vertex b region
        ([-0.5, 2.0, 0.2], [0.0, 1.0, 0.0]),      # vertex c region
        ([0.5, -1.0, 0.0], [0.5, 0.0, 0.0]),      # edge ab
        ([-1.0, 0.5, 0.0], [0.0, 0.5, 0.0]),      # edge ac
        ([1.0, 1.0, 0.0], [0.5, 0.5, 0.0]),       # edge bc
    ]
    for p, want in cases:
        bary, d2 = closest_point_triangle(jnp.asarray(p), a, b, c)
        got = bary[0] * a + bary[1] * b + bary[2] * c
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)
        np.testing.assert_allclose(
            float(d2), np.sum((np.asarray(p) - np.asarray(want)) ** 2),
            atol=1e-6)
        assert abs(float(jnp.sum(bary)) - 1.0) < 1e-6


def test_vertex_face_rings_cover_incident_faces():
    from avatar_tpu.optim.surface import vertex_face_rings
    from avatar_tpu.testing import synthetic_model

    model = synthetic_model(detail=1)
    faces = np.asarray(model.faces)
    ring = vertex_face_rings(faces, model.num_points())
    # every face must appear in each of its three vertices' rings (no
    # vertex in the synthetic mesh exceeds the ring capacity)
    for f in [0, len(faces) // 2, len(faces) - 1]:
        for v in faces[f]:
            assert f in ring[v]


def test_surface_correspond_recovers_on_mesh_points(rng):
    from avatar_tpu.optim import correspond
    from avatar_tpu.optim.surface import surface_correspond, \
        vertex_face_rings
    from avatar_tpu.testing import synthetic_model
    from avatar_tpu.core.model import Avatar

    model = synthetic_model(detail=2)
    ava = Avatar(model)
    ava.randomize(seed=3)
    ava.update()
    x = jnp.asarray(ava.cloud, jnp.float32)
    faces = jnp.asarray(model.faces, jnp.int32)
    ring = jnp.asarray(vertex_face_rings(np.asarray(model.faces),
                                         model.num_points()))
    F = faces.shape[0]
    fi = rng.integers(0, F, 256)
    b = rng.dirichlet([1.0, 1.0, 1.0], 256).astype(np.float32)
    pts = jnp.asarray((b[:, :, None] * np.asarray(x)[np.asarray(faces)[fi]]
                       ).sum(1))
    zeros = jnp.zeros(256, jnp.int32)
    st = correspond.find_nn_stats(
        pts, zeros, x, jnp.zeros(x.shape[0], jnp.int32),
        jnp.ones(x.shape[0], bool), chunk=512)
    tri, bary, fn, valid = surface_correspond(pts, st.corr, x, faces, ring)
    sp = jnp.sum(bary[..., None] * x[tri], axis=1)
    d = np.linalg.norm(np.asarray(sp - pts), axis=1)
    # the NN vertex's one-ring contains the true triangle for the vast
    # majority of surface points; a small tail lands on an adjacent ring
    # (fit_refine's robust weights absorb it)
    assert np.median(d) < 1e-4
    assert (d < 1e-3).mean() > 0.85
    assert bool(valid.all())


@pytest.mark.slow
def test_converged_fit_submillimeter():
    """bench.py fit_rmse_mm gate at the quick configuration (<1 mm)."""
    from avatar_tpu.core.model import Avatar
    from avatar_tpu.io.calibration import CameraIntrin
    from avatar_tpu.optim.gauss_newton import FitContext, PriorData, Theta, \
        fit_refine
    from avatar_tpu.optim.surface import vertex_face_rings
    from avatar_tpu.render.renderer import AvatarRenderer
    from avatar_tpu.testing import synthetic_model
    from avatar_tpu.core.lbs import lbs

    H, W = 256, 256
    intrin = CameraIntrin(fx=220.0, fy=220.0, cx=128.0, cy=128.0)
    model = synthetic_model(detail=2)
    gt = Avatar(model)
    gt.randomize(seed=77)
    gt.w *= 0.3
    gt.p = np.array([0.0, 0.1, 2.6])
    gt.r[0] = np.diag([-1.0, 1.0, -1.0])
    gt.update()
    rend = AvatarRenderer(gt, intrin)
    depth = np.asarray(rend.render_depth((H, W)))
    mask = np.asarray(rend.render_part_mask((H, W)))
    depth = (np.where(depth > 0, depth, 0) * 1000).astype(np.uint16)

    stride = 2
    d0 = depth[::stride, ::stride].astype(np.float32) * 1e-3
    m0 = mask[::stride, ::stride]
    ys = np.arange(d0.shape[0]) * stride
    xs = np.arange(d0.shape[1]) * stride
    sub = np.stack([(xs[None, :] - intrin.cx) * d0 / intrin.fx,
                    -(ys[:, None] - intrin.cy) * d0 / intrin.fy, d0], -1)
    fgm = (m0 != 255) & (d0 > 0)
    n0 = int(fgm.sum())
    B0 = 1024
    while B0 < n0:
        B0 *= 2
    pts = np.zeros((B0, 3), np.float32)
    pts[:n0] = sub[fgm]
    parts = np.full(B0, -1, np.int32)
    parts[:n0] = m0[fgm]

    mp = np.arange(model.num_joints(), dtype=np.int32)[model.main_joint]
    ctx = FitContext(
        lbs=model.params,
        anc_mask=jnp.asarray(model.ancestor_mask, model.dtype),
        faces=jnp.asarray(model.faces, jnp.int32),
        model_part=jnp.asarray(mp, jnp.int32),
        prior=PriorData(model.pose_prior.means, model.pose_prior.prec_cho,
                        model.pose_prior.consts_log))
    ring = jnp.asarray(vertex_face_rings(np.asarray(model.faces),
                                         model.num_points()))
    theta_gt = Theta(p=jnp.asarray(gt.p, jnp.float32),
                     rots=jnp.asarray(gt.r, jnp.float32),
                     w=jnp.asarray(gt.w, jnp.float32))
    out, diag = fit_refine(
        ctx, model.parents, ring, jnp.asarray(pts), jnp.asarray(parts),
        theta_gt, jnp.asarray(1e-4, jnp.float32),
        jnp.asarray(1e-4, jnp.float32), n_steps=20,
        num_parts=model.num_joints())
    v, _, _, _ = lbs(model.params, model.parents, out.w, out.p, out.rots)
    rmse_mm = float(np.sqrt(np.mean(np.sum(
        (np.asarray(v) - gt.cloud) ** 2, -1))) * 1e3)
    assert rmse_mm < 1.0, f"converged fit drifted {rmse_mm:.2f} mm off GT"
