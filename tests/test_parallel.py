"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avatar_tpu.io.calibration import CameraIntrin
from avatar_tpu.parallel import training as ptrain
from avatar_tpu.testing import synthetic_model
from avatar_tpu.train import synth
from avatar_tpu.train.forest import pass_counts, pass_minmax

INTRIN = CameraIntrin(fx=120.0, fy=120.0, cx=48.0, cy=48.0)
H = W = 96


@pytest.fixture(scope="module")
def setup():
    model = synthetic_model(detail=1)
    src = synth.make_source(model, INTRIN, n_images=16, seed=2)
    return model, src


def test_mesh_available():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"


def test_sharded_render_matches_single(setup):
    model, src = setup
    mesh = ptrain.make_mesh()
    ids = jnp.arange(8, dtype=jnp.int32)
    d_sh, m_sh, j_sh = ptrain.sharded_render_batch(
        mesh, src, model.parents, ids, 2, H, W, model.num_shape_keys())
    d_1, m_1, j_1 = synth.render_batch(src, model.parents, ids, 2, H, W,
                                       model.num_shape_keys())
    # sharded and single-device compilations may differ by f32 ULPs
    np.testing.assert_allclose(np.asarray(d_sh), np.asarray(d_1), atol=1e-5)
    agree = (np.asarray(m_sh) == np.asarray(m_1)).mean()
    assert agree > 0.999, f"part masks diverge: {agree:.4%}"


def test_sharded_count_step_matches_single(setup):
    model, src = setup
    mesh = ptrain.make_mesh()
    rng = np.random.default_rng(0)
    B, S, F, NC, T, P = 8, 64, 12, 2, 8, 24
    ids = jnp.arange(B, dtype=jnp.int32)
    depth, mask, _ = synth.render_batch(src, model.parents, ids, 2, H, W,
                                        model.num_shape_keys())
    depth_np = np.asarray(depth)
    mask_np = np.asarray(mask)
    sx = np.zeros((B, S), np.int32)
    sy = np.zeros((B, S), np.int32)
    part = np.zeros((B, S), np.int32)
    valid = np.zeros((B, S), bool)
    for b in range(B):
        ys, xs = np.nonzero(depth_np[b] > 0)
        take = min(S, len(ys))
        pick = rng.choice(len(ys), take, replace=False)
        sx[b, :take] = xs[pick]
        sy[b, :take] = ys[pick]
        part[b, :take] = mask_np[b][ys[pick], xs[pick]]
        valid[b, :take] = True
    node_local = np.where(valid, rng.integers(0, NC, (B, S)), -1).astype(
        np.int32)
    fu = jnp.asarray(rng.uniform(-40, 40, (F, 2)), jnp.float32)
    fv = jnp.asarray(rng.uniform(-40, 40, (F, 2)), jnp.float32)

    counts_sh, smin_sh, smax_sh = ptrain.sharded_count_step(
        mesh, model.parents, src, ids, jnp.asarray(sx), jnp.asarray(sy),
        jnp.asarray(part), jnp.asarray(valid), jnp.asarray(node_local),
        fu, fv, NC, T, P, 2, H, W, model.num_shape_keys())

    smin_1, smax_1 = pass_minmax(depth, jnp.asarray(sx), jnp.asarray(sy),
                                 jnp.asarray(valid), jnp.asarray(node_local),
                                 fu, fv, NC)
    counts_1 = pass_counts(depth, jnp.asarray(sx), jnp.asarray(sy),
                           jnp.asarray(part), jnp.asarray(valid),
                           jnp.asarray(node_local), fu, fv, smin_1, smax_1,
                           NC, T, P)
    np.testing.assert_allclose(np.asarray(smin_sh), np.asarray(smin_1),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(smax_sh), np.asarray(smax_1),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(counts_sh), np.asarray(counts_1),
                               atol=1e-4)
    assert float(jnp.sum(counts_sh)) == float(valid.sum()) * F


def test_sharded_multistream_lbs(setup):
    model, _ = setup
    mesh = ptrain.make_mesh()
    rng = np.random.default_rng(1)
    B = 8
    from avatar_tpu.core import rotation

    w = jnp.asarray(rng.normal(0, 0.5, (B, 10)), jnp.float32)
    p = jnp.asarray(rng.normal(0, 0.5, (B, 3)), jnp.float32)
    aa = rng.normal(0, 0.3, (B, 24, 3))
    rots = rotation.so3_exp(jnp.asarray(aa, jnp.float32))
    clouds, joints, _, _ = ptrain.sharded_multistream_lbs(
        mesh, model.params, model.parents, w, p, rots)
    from avatar_tpu.core.lbs import lbs

    c0, j0, _, _ = lbs(model.params, model.parents, w[0], p[0], rots[0])
    np.testing.assert_allclose(np.asarray(clouds[0]), np.asarray(c0),
                               atol=1e-6)


def test_sharded_track_step(setup):
    """8 independent camera streams tracked in one sharded step must match
    the single-stream fused frame on each stream."""
    from avatar_tpu.core.model import Avatar
    from avatar_tpu.render.renderer import AvatarRenderer
    from avatar_tpu.tracking import TrackerConfig
    from avatar_tpu.tracking_fused import FusedTracker, _fused_frame_impl

    model, _ = setup
    mesh = ptrain.make_mesh()
    S = 8
    cfg = TrackerConfig(data_interval=4, min_points=50, iters_per_icp=2,
                        seg_window=None)
    tr = FusedTracker(model, INTRIN, (H, W), config=cfg)
    # S streams: the same scene shifted per stream
    ava = Avatar(model)
    ava.randomize(seed=5)
    ava.w *= 0.2
    ava.r[0] = np.diag([-1.0, 1.0, -1.0])
    depths, labels = [], []
    for s in range(S):
        ava.p = np.array([0.02 * s - 0.08, 0.1, 2.0])
        ava.update()
        rend = AvatarRenderer(ava, INTRIN)
        depths.append(np.asarray(rend.render_depth((H, W))))
        labels.append(np.asarray(rend.render_part_mask((H, W))))
    depth_b = jnp.asarray(np.stack(depths))
    labels_b = jnp.asarray(np.stack(labels))
    J = model.num_joints()
    rots = np.tile(np.eye(3), (S, J, 1, 1))
    rots[:, 0] = np.diag([-1.0, 1.0, -1.0])
    from avatar_tpu.optim.gauss_newton import Theta

    thetas_b = Theta(
        p=jnp.asarray(np.tile([0.0, 0.1, 2.0], (S, 1)), jnp.float32),
        rots=jnp.asarray(rots, jnp.float32),
        w=jnp.zeros((S, model.num_shape_keys()), jnp.float32))
    com_b = jnp.tile(jnp.asarray(
        np.concatenate([np.full((1, tr.num_parts), -1.0),
                        np.zeros((1, tr.num_parts))]), jnp.float32),
        (S, 1, 1))
    consts = tr._consts()
    kwargs = dict(
        beta_pose=consts["beta_pose"], beta_shape=consts["beta_shape"],
        nn_t=consts["nn_t"], nb_t=consts["nb_t"],
        min_cc_pts=consts["min_cc"], dist_to_pre_weight=consts["d2p"],
        seg_stride=1, data_substride=tr._data_substride, n_steps=4,
        num_parts=tr.num_parts, max_depth=0, use_forest=False,
        use_bgsub=False, use_jsr=model.use_joint_shape_regressor,
        pad_n=tr._pad_n, seg_window=None,
        point_weight=consts["point_weight"],
        plane_weight=consts["plane_weight"], huber_k=consts["huber_k"])
    out = ptrain.sharded_track_step(
        mesh, tr._ctx, tr._ctx_fit, None, model.parents, depth_b, labels_b,
        tr._bg, tr._intrin4, thetas_b, com_b, kwargs)
    # reference: run stream 3 alone through the unsharded program
    one = _fused_frame_impl(
        tr._ctx, tr._ctx_fit, None, model.parents, depth_b[3], labels_b[3],
        tr._bg, tr._intrin4,
        jax.tree.map(lambda a: a[3], thetas_b), com_b[3], **kwargs)
    np.testing.assert_allclose(np.asarray(out.theta.p[3]),
                               np.asarray(one.theta.p), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.host_diag[3]),
                               np.asarray(one.host_diag), atol=1e-4)


def test_mesh_trainer_identical_tree(setup):
    """ForestTrainer(mesh=...) must grow the SAME tree as the single-device
    trainer: pmin/pmax are order-independent and the psum'd histogram
    counts are integer-valued f32 (exact addition), so every split decision
    matches.  This exercises the PRODUCTION trainer entry point on the
    mesh, not just the standalone sharded step."""
    from avatar_tpu.train.forest import ForestTrainer

    model, _ = setup
    kwargs = dict(num_parts=24, num_images=16, num_points_per_image=150,
                  num_features=16, max_probe_offset=48.0, min_samples=16,
                  max_tree_depth=5, image_batch=8, seed=9,
                  pass_mode="batch")
    fd_1 = ForestTrainer(model, INTRIN, (H, W), **kwargs).train()
    mesh = ptrain.make_mesh()
    fd_m = ForestTrainer(model, INTRIN, (H, W), mesh=mesh, **kwargs).train()
    np.testing.assert_array_equal(fd_m.lnode, fd_1.lnode)
    np.testing.assert_array_equal(fd_m.leafid, fd_1.leafid)
    np.testing.assert_array_equal(fd_m.u, fd_1.u)
    np.testing.assert_array_equal(fd_m.v, fd_1.v)
    np.testing.assert_allclose(fd_m.thresh, fd_1.thresh, rtol=1e-6)
    np.testing.assert_allclose(fd_m.leaf_data, fd_1.leaf_data, atol=1e-7)
