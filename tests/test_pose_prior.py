"""GaussianMixture pose prior vs numpy oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from avatar_tpu.testing import synthetic_pose_prior
from tests.ref_impl import gmm_pdf_reference


def test_pdf_matches_oracle(rng):
    gm = synthetic_pose_prior(n_joints=8, n_comps=3, seed=3)
    d = gm.n_dims
    for _ in range(3):
        x = rng.normal(0, 0.3, d)
        ref = gmm_pdf_reference(gm._np["weights"], gm._np["means"],
                                gm._np["covs"], x)
        got = float(gm.pdf(jnp.asarray(x, jnp.float32)))
        assert abs(got - ref) < 1e-5 * max(abs(ref), 1e-12) + 1e-7


def test_residual_semantics(rng):
    gm = synthetic_pose_prior(n_joints=8, n_comps=3, seed=4)
    d = gm.n_dims
    x = rng.normal(0, 0.3, d)
    resid, comp = gm.residual(jnp.asarray(x, jnp.float32))
    resid = np.asarray(resid)
    comp = int(comp)
    assert resid.shape == (d + 1,)
    # component must be the argmin of (0.5 quad - consts_log)
    energies = np.asarray(gm.component_energies(jnp.asarray(x, jnp.float32)))
    assert comp == int(np.argmin(energies))
    # |residual_head|^2 == 0.5 * mahalanobis^2 under that component
    L = gm._np["prec_cho"][comp]
    mah2 = float((x - gm._np["means"][comp]) @ (L @ L.T) @
                 (x - gm._np["means"][comp]))
    np.testing.assert_allclose(float(resid[:d] @ resid[:d]), 0.5 * mah2,
                               rtol=1e-4)
    # constant term: sqrt(-consts_log)
    np.testing.assert_allclose(
        float(resid[d] ** 2), -gm._np["consts_log"][comp], rtol=1e-4)


def test_residual_batched(rng):
    gm = synthetic_pose_prior(n_joints=8, n_comps=4, seed=5)
    xs = jnp.asarray(rng.normal(0, 0.4, (6, gm.n_dims)), jnp.float32)
    resid, comp = gm.residual(xs)
    assert resid.shape == (6, gm.n_dims + 1)
    r0, c0 = gm.residual(xs[0])
    np.testing.assert_allclose(np.asarray(resid[0]), np.asarray(r0), atol=1e-6)


def test_sample_statistics():
    gm = synthetic_pose_prior(n_joints=6, n_comps=2, seed=6)
    key = jax.random.PRNGKey(0)
    samples = np.asarray(gm.sample(key, (4000,)))
    # mixture mean
    w = gm._np["weights"]
    mix_mean = (w[:, None] * gm._np["means"]).sum(0)
    np.testing.assert_allclose(samples.mean(0), mix_mean, atol=0.1)
