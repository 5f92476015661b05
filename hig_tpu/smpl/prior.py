"""GMM max-mixture pose prior (SMPLify).

Equivalent of the reference's MaxMixturePrior
(codes/joints2smpl/src/prior.py:98-229, merged_log_likelihood path): the
per-sample prior is min over mixture components of
0.5·(x-μ)ᵀΣ⁻¹(x-μ) − log(nll_weight). Loads the standard gmm_08.pkl at
runtime (path configurable; the asset ships with SMPLify, e.g. the
reference checkout) and offers a synthetic prior for tests.
"""

from __future__ import annotations

import dataclasses
import pickle

import jax
import jax.numpy as jnp
import numpy as np

POSE_DIM = 69


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GMMPrior:
    means: jax.Array  # (K, 69)
    precisions: jax.Array  # (K, 69, 69)
    nll_weights: jax.Array  # (K,)

    def __call__(self, pose: jax.Array) -> jax.Array:
        """pose (..., 69) → per-sample negative log likelihood (...)."""
        diff = pose[..., None, :] - self.means  # (..., K, 69)
        quad = jnp.einsum("...ki,kij,...kj->...k", diff, self.precisions, diff)
        ll = 0.5 * quad - jnp.log(self.nll_weights)
        return jnp.min(ll, axis=-1)


def from_arrays(means: np.ndarray, covars: np.ndarray, weights: np.ndarray) -> GMMPrior:
    precisions = np.stack([np.linalg.inv(c) for c in covars])
    sqrdets = np.array([np.sqrt(np.linalg.det(c)) for c in covars])
    const = (2 * np.pi) ** (POSE_DIM / 2.0)
    nll_weights = weights / (const * (sqrdets / sqrdets.min()))
    return GMMPrior(
        means=jnp.asarray(means, jnp.float32),
        precisions=jnp.asarray(precisions, jnp.float32),
        nll_weights=jnp.asarray(nll_weights, jnp.float32),
    )


def load_gmm_prior(path: str) -> GMMPrior:
    """Load gmm_08.pkl ({means, covars, weights} dict, sklearn layout)."""
    with open(path, "rb") as f:
        gmm = pickle.load(f, encoding="latin1")
    if isinstance(gmm, dict):
        return from_arrays(gmm["means"], gmm["covars"], gmm["weights"])
    return from_arrays(gmm.means_, gmm.covars_, gmm.weights_)


def synthetic_gmm_prior(num_gaussians: int = 8, seed: int = 0) -> GMMPrior:
    rng = np.random.RandomState(seed)
    means = 0.1 * rng.randn(num_gaussians, POSE_DIM)
    covars = np.stack(
        [np.eye(POSE_DIM) * (0.2 + 0.1 * rng.rand()) for _ in range(num_gaussians)]
    )
    weights = rng.dirichlet(np.ones(num_gaussians))
    return from_arrays(means, covars, weights)
