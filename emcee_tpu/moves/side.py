"""Gaussianized difference ("side") move.

Inspired by the side-move family of Chen (2025), "New affine invariant
ensemble samplers and their dimensional scaling" (arXiv:2505.02987): the
walker steps along the difference of two complement members with a fully
Gaussian amplitude,

    q = s + (Z / sqrt(2)) * (c_i - c_j),   Z ~ N(0, sigma^2),

which is affine-invariant like DE/stretch but with proposal amplitudes
symmetric about zero; the ensemble-difference direction carries the target
covariance, and the Gaussian amplitude gives random-walk-Metropolis-like
dimensional scaling with ``sigma ~ 2.38 / sqrt(ndim)``.  The proposal is
symmetric (Z is sign-symmetric and the (i, j) pair exchangeable), so
Hastings factors are zero.

No counterpart exists in the reference; this extends the move family.
Execution engines mirror :class:`DEMove` (random pair gathers or the
gather-free roll pairing).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .red_blue import RedBlueMove

__all__ = ["SideMove"]


class SideMove(RedBlueMove):
    """Gaussian-amplitude ensemble-difference proposal.

    Args:
        sigma: amplitude scale; default ``2.38 / sqrt(ndim)`` at proposal
            time (the classic RWM-optimal scaling).
        pair_mode: ``"random"`` per-walker pair draws or ``"roll"``
            (gather-free circular pairing, the TPU performance mode).
    """

    tunable = True

    def __init__(self, sigma=None, pair_mode="random", **kwargs):
        self.sigma = sigma
        if pair_mode not in ("random", "roll"):
            raise ValueError(f"unknown pair_mode: {pair_mode!r}")
        self.pair_mode = pair_mode
        super().__init__(**kwargs)

    def _sigma(self, gndim):
        if self.sigma is not None:
            return self.sigma
        return 2.38 / float(np.sqrt(gndim))

    def get_proposal(self, key, s, c_parts, model, scale=None):
        c = jnp.concatenate(c_parts, axis=0)
        ns, ndim = s.shape
        nc = c.shape[0]
        sigma = self._sigma(model.global_ndim(ndim))
        if scale is not None:
            sigma = sigma * scale

        if self.pair_mode == "roll":
            z = jax.random.normal(key, (ns + 2,), dtype=s.dtype)
            u1 = jax.scipy.stats.norm.cdf(z[ns])
            u2 = jax.scipy.stats.norm.cdf(z[ns + 1])
            s1 = (u1 * nc).astype(jnp.int32)
            d = 1 + (u2 * (nc - 1)).astype(jnp.int32)
            s2 = (s1 + d) % nc
            diffs = (
                jnp.roll(c, -s2, axis=0)[:ns] - jnp.roll(c, -s1, axis=0)[:ns]
            )
            amp = z[:ns, None]
        else:
            key_i, key_j, key_z = jax.random.split(key, 3)
            i = jax.random.randint(key_i, (ns,), 0, nc)
            j = jax.random.randint(key_j, (ns,), 0, nc - 1)
            j = jnp.where(j >= i, j + 1, j)  # uniform ordered pairs, i != j
            diffs = c[j] - c[i]
            amp = jax.random.normal(key_z, (ns, 1), dtype=s.dtype)

        q = s + (sigma / jnp.sqrt(2.0)) * amp * diffs
        return q, jnp.zeros(ns, dtype=s.dtype)
