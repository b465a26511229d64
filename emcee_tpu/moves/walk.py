"""Goodman & Weare (2010) walk move.

Matches the reference (``/root/reference/src/emcee/moves/walk.py:10-37``):
propose ``q_i ~ N(s_i, Cov(subset of complement))`` where the subset is
``s0`` complement walkers drawn without replacement (all of them by default).

The reference loops over walkers calling ``np.cov`` + ``multivariate_normal``
per walker.  TPU-native version:

* default case (``s = None``, subset == full complement): the covariance is
  identical for every walker, so compute it once, Cholesky once, and draw
  all proposals with a single ``(ns, ndim) @ L^T`` matmul on the MXU;
* subset case: vmapped per-walker subset selection (via per-walker random
  permutation) + batched covariance + eigh-based MVN sampling (robust to the
  near-singular covariances small subsets produce, like numpy's SVD-based
  ``multivariate_normal``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .red_blue import RedBlueMove

__all__ = ["WalkMove"]


def _cov(x):
    """np.cov(x, rowvar=False) equivalent: (n, d) -> (d, d), ddof=1."""
    n = x.shape[0]
    xc = x - jnp.mean(x, axis=0, keepdims=True)
    return (xc.T @ xc) / (n - 1)


class WalkMove(RedBlueMove):
    """The ensemble walk move.

    Args:
        s: number of helper walkers; default uses the whole complement.
        exact_subset_max: complement-size threshold below which per-walker
            subsets are drawn exactly without replacement (reference
            semantics, ``walk.py:28-35``).  Above it, the O(nw * nc)
            permutation materialization is infeasible (1e5-walker
            ensembles), so subsets are bootstrap draws *with* replacement —
            an O(nw * s) per-step cost.  The proposal stays symmetric
            given the complement either way, so detailed balance is
            unaffected; with-replacement only perturbs the subset-size
            statistics by O(s^2 / nc), negligible in the large-``nc``
            regime where it activates.
    """

    tunable = True

    def __init__(self, s=None, exact_subset_max=4096, **kwargs):
        self.s = s
        self.exact_subset_max = int(exact_subset_max)
        super().__init__(**kwargs)

    def get_proposal(self, key, s, c_parts, model, scale=None):
        if model.param_axis is not None:
            raise NotImplementedError(
                "WalkMove does not support parameter-axis sharding (its "
                "covariance couples all dimensions); use Stretch/DE/"
                "Snooker/Gaussian moves for long-ndim runs"
            )
        c = jnp.concatenate(c_parts, axis=0)
        ns, ndim = s.shape
        nc = c.shape[0]
        s0 = nc if self.s is None else int(self.s)

        adj = 1.0 if scale is None else scale
        if s0 >= nc:
            # Shared covariance: one Cholesky + one MXU matmul for all
            # proposals.
            cov = _cov(c)
            chol = jnp.linalg.cholesky(cov)
            z = jax.random.normal(key, (ns, ndim), dtype=s.dtype)
            return s + adj * (z @ chol.T), jnp.zeros(ns, dtype=s.dtype)

        exact = nc <= self.exact_subset_max

        def one(k, si):
            k_sub, k_draw = jax.random.split(k)
            if exact:
                inds = jax.random.choice(k_sub, nc, (s0,), replace=False)
            else:
                inds = jax.random.randint(k_sub, (s0,), 0, nc)
            cov = _cov(c[inds])
            dz = jax.random.multivariate_normal(
                k_draw, jnp.zeros_like(si), cov, method="svd", dtype=s.dtype
            )
            return si + adj * dz

        keys = jax.random.split(key, ns)
        q = jax.vmap(one)(keys, s)
        return q, jnp.zeros(ns, dtype=s.dtype)
