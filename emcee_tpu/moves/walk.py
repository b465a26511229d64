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
    """

    def __init__(self, s=None, **kwargs):
        self.s = s
        super().__init__(**kwargs)

    def get_proposal(self, key, s, c_parts, model):
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

        if s0 >= nc:
            # Shared covariance: one Cholesky + one MXU matmul for all
            # proposals.
            cov = _cov(c)
            chol = jnp.linalg.cholesky(cov)
            z = jax.random.normal(key, (ns, ndim), dtype=s.dtype)
            return s + z @ chol.T, jnp.zeros(ns, dtype=s.dtype)

        def one(k, si):
            k_sub, k_draw = jax.random.split(k)
            inds = jax.random.choice(k_sub, nc, (s0,), replace=False)
            cov = _cov(c[inds])
            return jax.random.multivariate_normal(
                k_draw, si, cov, method="svd", dtype=s.dtype
            )

        keys = jax.random.split(key, ns)
        q = jax.vmap(one)(keys, s)
        return q, jnp.zeros(ns, dtype=s.dtype)
