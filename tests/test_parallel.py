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
