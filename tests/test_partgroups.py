"""Part-group folding + temporal-prior unit tests."""

import numpy as np
import pytest

from avatar_tpu.perception.partgroups import (
    SMPL24_GROUP_LUT, SMPL24_NUM_GROUPS, fold_leaf_data, group_label_lut)


def test_lut_covers_all_groups():
    assert SMPL24_GROUP_LUT.shape == (24,)
    assert SMPL24_GROUP_LUT.max() + 1 == SMPL24_NUM_GROUPS
    assert set(SMPL24_GROUP_LUT) == set(range(SMPL24_NUM_GROUPS))
    # left/right never merge: joint pairs (1,2), (4,5), (7,8), (10,11),
    # (16,17), (18,19), (20,21), (22,23)
    for l, r in [(1, 2), (4, 5), (7, 8), (10, 11), (16, 17), (18, 19),
                 (20, 21), (22, 23)]:
        assert SMPL24_GROUP_LUT[l] != SMPL24_GROUP_LUT[r]


def test_fold_leaf_data_sums_members():
    rng = np.random.default_rng(0)
    ld = rng.random((5, 24)).astype(np.float32)
    g = fold_leaf_data(ld, SMPL24_GROUP_LUT, SMPL24_NUM_GROUPS)
    assert g.shape == (5, SMPL24_NUM_GROUPS)
    np.testing.assert_allclose(g.sum(1), ld.sum(1), rtol=1e-6)
    # torso group = sum over its member parts
    members = np.where(SMPL24_GROUP_LUT == 0)[0]
    np.testing.assert_allclose(g[:, 0], ld[:, members].sum(1), rtol=1e-6)


def test_group_label_lut_background():
    lut = group_label_lut(SMPL24_GROUP_LUT)
    assert lut.shape == (256,)
    assert lut[255] == 255
    assert lut[0] == SMPL24_GROUP_LUT[0]
    img = np.array([[0, 22, 255]], np.uint8)
    out = lut[img]
    assert out.tolist() == [[SMPL24_GROUP_LUT[0], SMPL24_GROUP_LUT[22], 255]]


def test_temporal_prior_holds_unobserved_joints():
    """With beta_temp large and zero data, the fit must stay at theta0."""
    import jax.numpy as jnp

    from avatar_tpu.optim.gauss_newton import fit
    from avatar_tpu.testing import synthetic_model
    from avatar_tpu.tracking_fused import FusedTracker
    from avatar_tpu.io.calibration import CameraIntrin
    from avatar_tpu.core.model import Avatar
    from avatar_tpu.optim.gauss_newton import Theta

    model = synthetic_model(detail=2)
    intrin = CameraIntrin(fx=220.0, fy=220.0, cx=128.0, cy=128.0)
    tr = FusedTracker(model, intrin, (256, 256))
    ava = Avatar(model)
    ava.randomize(seed=3)
    theta0 = Theta(p=jnp.asarray(ava.p, jnp.float32),
                   rots=jnp.asarray(ava.r, jnp.float32),
                   w=jnp.asarray(ava.w, jnp.float32))
    pts = jnp.zeros((1024, 3), jnp.float32)
    parts = jnp.full((1024,), -1, jnp.int32)   # no data at all
    th, _ = fit(tr._ctx, model.parents, pts, parts, theta0,
                jnp.asarray(0.0, jnp.float32), jnp.asarray(0.0, jnp.float32),
                n_steps=4, beta_temp=10.0)
    # no data + no priors + temporal anchor => pose unchanged
    np.testing.assert_allclose(np.asarray(th.rots), np.asarray(theta0.rots),
                               atol=5e-3)
