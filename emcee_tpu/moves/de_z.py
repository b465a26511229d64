"""DE-MC(Z): differential evolution with an archive of past states.

ter Braak & Vrugt (2008), "Differential Evolution Markov Chain with
snooker updater and fewer chains": difference vectors are drawn from an
archive Z of *past* ensemble states instead of (only) the current
chains.  Sampling directions from history is what lets DE-MC run with
far fewer chains than dimensions — the regime where every
current-ensemble move degenerates (the reference guards
``nwalkers >= 2 * ndim`` for exactly this reason,
``/root/reference/src/emcee/moves/red_blue.py:64-70``).

Design here: the red-blue split is kept (frozen-complement exactness
for the current-state part), and the pair pool for each group is
``concat(complement, archive)`` — early steps reduce to the classic
:class:`DEMove`, and as the archive fills the pool grows to
``nc + archive_size`` states spanning the chain's history
(adaptation-on-history; ter Braak & Vrugt prove ergodicity for the
pure-archive version).  The archive is a fixed-size ring buffer carried
through the scan; each proposal folds a strided, rotating subsample of
the post-accept ensemble into it (cross-shard rows via all_gather, so
the replicated carry stays identical on every shard).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .red_blue import RedBlueMove

__all__ = ["DEZMove"]


class DEZMove(RedBlueMove):
    """Differential evolution from past states (DE-MC(Z)).

    Args:
        sigma: stddev of the Gaussian jitter on gamma (default 1e-5).
        gamma0: mean stretch factor; default ``2.38 / sqrt(2 ndim)``.
        g1_prob: per-walker probability of a full-length ``gamma = 1``
            jump (ter Braak & Vrugt's mode-jumping recommendation;
            default 0.1).
        archive_size: ring-buffer capacity in states (default
            ``max(10 * nwalkers, 1024)``, rounded up to a multiple of
            ``update_rows``).
        update_rows: ensemble rows folded into the archive per proposal
            (default 64).

    For ``nwalkers < 2 * ndim`` — the use case this move exists for —
    pass ``live_dangerously=True``; the archive supplies the missing
    directions once it has filled past ``~2 * ndim`` states.
    """

    wants_carry = True
    blendable = False
    _param_shard_ok = False

    def __init__(self, sigma=1.0e-5, gamma0=None, g1_prob=0.1,
                 archive_size=None, update_rows=64, **kwargs):
        self.sigma = float(sigma)
        self.gamma0 = gamma0
        self.g1_prob = float(g1_prob)
        if not 0.0 <= self.g1_prob <= 1.0:
            raise ValueError("g1_prob must be in [0, 1]")
        self.archive_size = archive_size
        self.update_rows = int(update_rows)
        if self.update_rows < 1:
            raise ValueError("update_rows must be >= 1")
        super().__init__(**kwargs)

    def _capacity(self, nwalkers):
        k = self.archive_size
        if k is None:
            k = max(10 * nwalkers, 1024)
        u = self.update_rows
        return ((int(k) + u - 1) // u) * u  # multiple of update_rows

    def init_carry(self, nwalkers, ndim):
        k = self._capacity(nwalkers)
        return {
            "z": jnp.zeros((k, ndim), dtype=jnp.float32),
            "filled": jnp.zeros((), dtype=jnp.int32),
            "ptr": jnp.zeros((), dtype=jnp.int32),
        }

    def get_proposal(self, key, s, c_parts, model, carry=None):
        if model.param_axis is not None:
            raise NotImplementedError(
                "DEZMove indexes whole parameter vectors and does not "
                "support parameter-axis sharding"
            )
        c = jnp.concatenate(c_parts, axis=0)
        ns, ndim = s.shape
        nc = c.shape[0]
        dtype = s.dtype

        # Pair pool: frozen complement + the filled part of the archive.
        # Unfilled rows sit past n_avail and are never drawn.
        pool = jnp.concatenate([c, carry["z"].astype(dtype)], axis=0)
        n_avail = nc + carry["filled"]

        key_i, key_j, key_g, key_1 = jax.random.split(key, 4)
        i = jax.random.randint(key_i, (ns,), 0, n_avail)
        j = jax.random.randint(key_j, (ns,), 0, n_avail - 1)
        j = jnp.where(j >= i, j + 1, j)  # uniform over ordered pairs
        diffs = pool[j] - pool[i]

        g0 = self.gamma0
        if g0 is None:
            g0 = 2.38 / jnp.sqrt(2.0 * model.global_ndim(ndim))
        gamma = g0 * (
            1.0
            + self.sigma * jax.random.normal(key_g, (ns, 1), dtype=dtype)
        )
        if self.g1_prob > 0.0:
            # Occasional full-length jumps move walkers between modes
            # whose separation vector lives in the archive.
            jump = jax.random.uniform(key_1, (ns, 1), dtype=dtype) < (
                self.g1_prob
            )
            gamma = jnp.where(jump, jnp.ones_like(gamma), gamma)
        q = s + gamma * diffs
        return q, jnp.zeros(ns, dtype=dtype)

    def update_carry(self, carry, state, model):
        """Fold a strided, rotating ensemble subsample into the ring.

        The write block never wraps (capacity is a multiple of
        ``update_rows``), and under walker sharding each shard
        contributes an equal slice (all_gather keeps the replicated
        carry bit-identical across shards).
        """
        coords = state.coords
        nw_local = coords.shape[0]
        u = self.update_rows
        ptr = carry["ptr"]

        if model.axis_name is not None:
            shards = max(1, (model.nwalkers or nw_local) // nw_local)
        else:
            shards = 1
        u_loc = max(1, u // shards)
        stride = max(1, nw_local // u_loc)
        # Rotate the subsample offset with the write pointer so
        # successive updates cover different walkers.
        idx = (ptr + jnp.arange(u_loc, dtype=jnp.int32) * stride) % (
            nw_local
        )
        rows = coords[idx]
        if model.axis_name is not None:
            rows = jax.lax.all_gather(
                rows, model.axis_name, axis=0, tiled=True
            )
        rows = rows[:u].astype(jnp.float32)
        nrows = rows.shape[0]

        k = carry["z"].shape[0]
        z = jax.lax.dynamic_update_slice(carry["z"], rows, (ptr, 0))
        return {
            "z": z,
            "filled": jnp.minimum(carry["filled"] + nrows, k),
            "ptr": (ptr + nrows) % k,
        }
