"""Differential-evolution move (Ter Braak 2006 / Nelson et al. 2013).

Matches the reference (``/root/reference/src/emcee/moves/de.py:11-77``):
``q = s + gamma * (c[i] - c[j])`` with ``i != j`` drawn uniformly from the
complement and ``gamma = gamma0 * (1 + sigma * N(0,1))``,
``gamma0 = 2.38 / sqrt(2 ndim)`` by default.  Hastings factors are zero
(symmetric proposal).

The reference materializes an O(Nc^2) table of non-diagonal index pairs
(``de.py:67-77``) — infeasible at 1e5 walkers.  A uniform draw over ordered
pairs with ``i != j`` is equivalent: draw ``i`` uniform on [0, Nc) and ``j``
uniform on [0, Nc-1), then shift ``j`` past ``i`` — O(Ns) memory.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .red_blue import RedBlueMove

__all__ = ["DEMove"]


class DEMove(RedBlueMove):
    """Differential evolution proposal.

    Args:
        sigma: stddev of the Gaussian jitter on gamma (default 1e-5).
        gamma0: mean stretch factor; default ``2.38 / sqrt(2 ndim)``.
    """

    tunable = True

    def __init__(self, sigma=1.0e-5, gamma0=None, pair_mode="random",
                 **kwargs):
        self.sigma = float(sigma)
        self.gamma0 = gamma0
        if pair_mode not in ("random", "roll"):
            raise ValueError(f"unknown pair_mode: {pair_mode!r}")
        self.pair_mode = pair_mode
        super().__init__(**kwargs)

    def get_proposal(self, key, s, c_parts, model, scale=None):
        c = jnp.concatenate(c_parts, axis=0)
        ns, ndim = s.shape
        nc = c.shape[0]
        g0 = self.gamma0
        if g0 is None:
            # "Pure MAGIC" default from the two references (de.py:36-38).
            g0 = 2.38 / jnp.sqrt(2.0 * model.global_ndim(ndim))
        if scale is not None:
            g0 = g0 * scale

        if self.pair_mode == "roll":
            # Contiguous pairing (see StretchMove.pair_mode): two distinct
            # random shifts give c[(i+s1)%nc] - c[(i+s2)%nc] with the pair
            # members always distinct — no gather in the hot loop, and the
            # shift uniforms ride in the same fused draw as gamma's
            # normals (one RNG kernel per half-step).
            z = jax.random.normal(key, (ns + 2,), dtype=s.dtype)
            u1 = jax.scipy.stats.norm.cdf(z[ns])
            u2 = jax.scipy.stats.norm.cdf(z[ns + 1])
            s1 = (u1 * nc).astype(jnp.int32)
            d = 1 + (u2 * (nc - 1)).astype(jnp.int32)
            s2 = (s1 + d) % nc
            diffs = (
                jnp.roll(c, -s2, axis=0)[:ns] - jnp.roll(c, -s1, axis=0)[:ns]
            )
            gamma = g0 * (1.0 + self.sigma * z[:ns, None])
        else:
            key_i, key_j, key_g = jax.random.split(key, 3)
            i = jax.random.randint(key_i, (ns,), 0, nc)
            j = jax.random.randint(key_j, (ns,), 0, nc - 1)
            # uniform over ordered pairs, i != j
            j = jnp.where(j >= i, j + 1, j)
            diffs = c[j] - c[i]
            gamma = g0 * (
                1.0
                + self.sigma
                * jax.random.normal(key_g, (ns, 1), dtype=s.dtype)
            )
        q = s + gamma * diffs
        return q, jnp.zeros(ns, dtype=s.dtype)
