"""Max-of-mixture Gaussian pose prior as pure JAX.

Re-design of the reference's MaxMixturePrior (reference:
smplify/prior.py:100-231): an 8-component GMM over the 69-dim body pose with
the min-over-components negative log likelihood computed as one einsum
quadratic form (the reference's "merged" path, prior.py:181-196).  The
mixture is a pytree (`GMMPrior`) so it lives inside jit/scan graphs.

Assets: loads the reference's data/gmm_08.pkl when present; otherwise builds
a deterministic synthetic mixture with the same shapes (tests/benchmarks).
"""

from __future__ import annotations

import os
import pickle
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class GMMPrior(NamedTuple):
    means: jnp.ndarray        # [K, 69]
    precisions: jnp.ndarray   # [K, 69, 69]
    nll_weights: jnp.ndarray  # [1, K]


def _from_arrays(means: np.ndarray, covs: np.ndarray, weights: np.ndarray) -> GMMPrior:
    precisions = np.stack([np.linalg.inv(c) for c in covs]).astype(np.float32)
    sqrdets = np.array([np.sqrt(np.linalg.det(c)) for c in covs])
    const = (2 * np.pi) ** (69 / 2.0)
    nll_weights = np.asarray(weights / (const * (sqrdets / sqrdets.min())))[None].astype(np.float32)
    return GMMPrior(
        means=jnp.asarray(means, jnp.float32),
        precisions=jnp.asarray(precisions),
        nll_weights=jnp.asarray(nll_weights),
    )


def load_gmm_prior(path: str | None = None, num_gaussians: int = 8) -> GMMPrior:
    if path and os.path.exists(path):
        with open(path, "rb") as f:
            gmm = pickle.load(f, encoding="latin1")
        if isinstance(gmm, dict):
            means = gmm["means"].astype(np.float32)
            covs = gmm["covars"].astype(np.float32)
            weights = gmm["weights"].astype(np.float32)
        else:  # sklearn GMM object
            means = gmm.means_.astype(np.float32)
            covs = gmm.covars_.astype(np.float32)
            weights = gmm.weights_.astype(np.float32)
        return _from_arrays(means, covs, weights)
    return synthetic_gmm_prior(num_gaussians)


def synthetic_gmm_prior(num_gaussians: int = 8, dim: int = 69, seed: int = 0) -> GMMPrior:
    """Deterministic well-conditioned mixture with real shapes."""
    rng = np.random.default_rng(seed)
    means = rng.normal(0, 0.3, (num_gaussians, dim)).astype(np.float32)
    covs = []
    for _ in range(num_gaussians):
        A = rng.normal(0, 0.05, (dim, dim))
        covs.append((A @ A.T + np.eye(dim) * 0.5).astype(np.float32))
    weights = rng.dirichlet(np.ones(num_gaussians)).astype(np.float32)
    return _from_arrays(means, np.stack(covs), weights)


def max_mixture_nll(prior: GMMPrior, body_pose: jnp.ndarray) -> jnp.ndarray:
    """Min-over-components NLL (reference: smplify/prior.py:181-196).

    Args:
      body_pose: [B, 69] axis-angle body pose (no global orient).
    Returns:
      [B] negative log likelihood (up to the reference's constant).
    """
    diff = body_pose[:, None, :] - prior.means[None]          # [B, K, 69]
    prec_diff = jnp.einsum("kij,bkj->bki", prior.precisions, diff)
    quad = jnp.sum(prec_diff * diff, axis=-1)                  # [B, K]
    loglik = 0.5 * quad - jnp.log(prior.nll_weights)
    return jnp.min(loglik, axis=1)
