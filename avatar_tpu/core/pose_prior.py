"""SMPLify-style Gaussian-mixture pose prior.

Rebuild of reference ``GaussianMixture`` (GaussianMixture.h/.cpp): loads the
``pose_prior.txt`` text format, precomputes Cholesky factors of covariance
and precision on the host (float64 numpy, matching the reference's Eigen
LLT), then evaluates pdf / min-component whitened residual / samples with
vectorized jnp over all components at once.

Text format (GaussianMixture.cpp:12-77):
  nComps nDims
  weight[0..C)
  mean rows (C x D)
  covariance matrices (C x D x D)

Residual convention (GaussianMixture.cpp:95-114): for the best (min
"energy") component c, residual = [ L_c^T (x - mu_c) * sqrt(0.5) ;
sqrt(-consts_log[c]) ] where L_c is the lower-Cholesky factor of the
*precision* matrix and consts_log carries the mixture weight/normalizer,
shifted so the largest is <= 0 via the min-determinant normalization.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


class GaussianMixture:
    def __init__(self, weights: np.ndarray, means: np.ndarray,
                 covs: np.ndarray, dtype=jnp.float32):
        """weights [C], means [C, D], covs [C, D, D] (numpy, float64)."""
        self.n_comps = int(weights.shape[0])
        self.n_dims = int(means.shape[1])
        weights = np.asarray(weights, np.float64)
        means = np.asarray(means, np.float64)
        covs = np.asarray(covs, np.float64)

        log_sqrt_2pi_n = self.n_dims * 0.5 * np.log(2 * np.pi)
        consts_log = np.log(weights) - log_sqrt_2pi_n
        cov_cho = np.linalg.cholesky(covs)                      # [C, D, D] lower
        prec = np.linalg.inv(covs)
        prec = 0.5 * (prec + np.swapaxes(prec, -1, -2))
        prec_cho = np.linalg.cholesky(prec)                     # [C, D, D] lower
        dets = np.array([np.prod(np.diag(cov_cho[i])) for i in range(self.n_comps)])
        consts_log -= np.log(dets)
        min_det = dets.min()
        consts_log += np.log(min_det)                           # normalize (ref :72-76)

        self._np = dict(weights=weights, means=means, covs=covs,
                        cov_cho=cov_cho, prec_cho=prec_cho,
                        consts_log=consts_log)
        self.weights = jnp.asarray(weights, dtype)
        self.means = jnp.asarray(means, dtype)
        self.cov_cho = jnp.asarray(cov_cho, dtype)
        self.prec_cho = jnp.asarray(prec_cho, dtype)
        self.consts_log = jnp.asarray(consts_log, dtype)
        self.consts = jnp.exp(self.consts_log)

    # -- construction ---------------------------------------------------------

    @classmethod
    def load(cls, path: str, dtype=jnp.float32) -> Optional["GaussianMixture"]:
        """Load ``pose_prior.txt``; returns None if the file is missing
        (reference behavior: prior silently disabled)."""
        try:
            with open(path, "r") as f:
                toks = f.read().split()
        except OSError:
            return None
        pos = 0

        def nxt():
            nonlocal pos
            t = float(toks[pos])
            pos += 1
            return t

        n_comps = int(nxt())
        n_dims = int(nxt())
        weights = np.array([nxt() for _ in range(n_comps)])
        means = np.array([nxt() for _ in range(n_comps * n_dims)]).reshape(
            n_comps, n_dims)
        covs = np.array([nxt() for _ in range(n_comps * n_dims * n_dims)]).reshape(
            n_comps, n_dims, n_dims)
        return cls(weights, means, covs, dtype)

    def save(self, path: str) -> None:
        d = self._np
        with open(path, "w") as f:
            f.write(f"{self.n_comps} {self.n_dims}\n")
            f.write(" ".join(repr(float(x)) for x in d["weights"]) + "\n")
            for row in d["means"]:
                f.write(" ".join(repr(float(x)) for x in row) + "\n")
            for c in d["covs"]:
                for row in c:
                    f.write(" ".join(repr(float(x)) for x in row) + "\n")

    # -- evaluation (jnp; safe to call inside jit) ------------------------------

    def component_energies(self, x):
        """[..., D] -> [..., C]: |L_c^T (x - mu_c)|^2 * 0.5 - consts_log[c].

        This is the quantity minimized to choose the residual component
        (GaussianMixture.cpp:98-111, including the 0.5 factor carried by the
        sqrt(0.5)-scaled residual).
        """
        diff = x[..., None, :] - self.means                      # [..., C, D]
        wh = jnp.einsum("cdk,...cd->...ck", self.prec_cho, diff,
                        precision=jax.lax.Precision.HIGHEST)
        return 0.5 * jnp.sum(wh * wh, axis=-1) - self.consts_log

    def pdf(self, x):
        """Mixture density at x (with the reference's minDet normalization).

        GaussianMixture.cpp:84-93.
        """
        diff = x[..., None, :] - self.means
        wh = jnp.einsum("cdk,...cd->...ck", self.prec_cho, diff,
                        precision=jax.lax.Precision.HIGHEST)
        quad = jnp.sum(wh * wh, axis=-1)
        return jnp.sum(self.consts * jnp.exp(-0.5 * quad), axis=-1)

    def residual(self, x):
        """Whitened min-component residual: [..., D] -> ([..., D+1], comp idx).

        GaussianMixture.cpp:95-114.
        """
        diff = x[..., None, :] - self.means
        wh = jnp.einsum("cdk,...cd->...ck", self.prec_cho, diff,
                        precision=jax.lax.Precision.HIGHEST) * jnp.sqrt(
            jnp.asarray(0.5, x.dtype))
        energies = jnp.sum(wh * wh, axis=-1) - self.consts_log
        comp = jnp.argmin(energies, axis=-1)
        best = jnp.take_along_axis(wh, comp[..., None, None], axis=-2)[..., 0, :]
        const_term = jnp.sqrt(-self.consts_log[comp])
        return jnp.concatenate([best, const_term[..., None]], axis=-1), comp

    def sample(self, key, shape=()):
        """Sample from the mixture: returns [..., D]."""
        kc, kn = jax.random.split(key)
        comp = jax.random.choice(kc, self.n_comps, shape=shape,
                                 p=self.weights / jnp.sum(self.weights))
        z = jax.random.normal(kn, shape + (self.n_dims,), self.means.dtype)
        L = self.cov_cho[comp]                                   # [..., D, D]
        return self.means[comp] + jnp.einsum("...dk,...k->...d", L, z)
