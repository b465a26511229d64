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

    def __init__(self, sigma=1.0e-5, gamma0=None, pair_mode="random",
                 engine="xla", **kwargs):
        self.sigma = float(sigma)
        self.gamma0 = gamma0
        if pair_mode not in ("random", "roll"):
            raise ValueError(f"unknown pair_mode: {pair_mode!r}")
        if engine not in ("xla", "pallas"):
            raise ValueError(f"unknown engine: {engine!r}")
        self.pair_mode = pair_mode
        self.engine = engine
        super().__init__(**kwargs)

    def _g0(self, gndim):
        if self.gamma0 is not None:
            return self.gamma0
        # "Pure MAGIC" default from the two references (de.py:36-38).
        return 2.38 / float(np.sqrt(2.0 * gndim))

    def _inner(self, k, s, c_parts, lp_s, blobs_s, log_u, model,
               extra=None):
        """Fused Pallas half-step (roll pairing) when selected."""
        if (
            self.engine != "pallas"
            or blobs_s is not None
            or model.param_axis is not None
        ):
            return super()._inner(
                k, s, c_parts, lp_s, blobs_s, log_u, model, extra=extra
            )

        from ..ops.de_kernel import fused_de_half_step

        if model.axis_name is not None:
            c_parts = tuple(
                jax.lax.all_gather(c, model.axis_name, axis=0, tiled=True)
                for c in c_parts
            )
        c = jnp.concatenate(c_parts, axis=0)
        ns = s.shape[0]
        nc = c.shape[0]
        z = jax.random.normal(k, (ns + 2,), dtype=s.dtype)
        u1 = jax.scipy.stats.norm.cdf(z[ns])
        u2 = jax.scipy.stats.norm.cdf(z[ns + 1])
        s1 = (u1 * nc).astype(jnp.int32)
        d = 1 + (u2 * (nc - 1)).astype(jnp.int32)
        s2 = (s1 + d) % nc

        def lp_fn(q):
            return model.compute_log_prob(q)[0]

        sel_c, sel_lp, acc = fused_de_half_step(
            s1,
            s2,
            s,
            c,
            lp_s,
            z[:ns],
            log_u,
            log_prob_fn=lp_fn,
            g0=self._g0(model.global_ndim(s.shape[1])),
            sigma=self.sigma,
        )
        return sel_c, sel_lp, None, acc

    def get_proposal(self, key, s, c_parts, model):
        c = jnp.concatenate(c_parts, axis=0)
        ns, ndim = s.shape
        nc = c.shape[0]
        g0 = self.gamma0
        if g0 is None:
            # "Pure MAGIC" default from the two references (de.py:36-38).
            g0 = 2.38 / jnp.sqrt(2.0 * model.global_ndim(ndim))

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
