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
        snooker_prob: per-walker probability of a snooker update from
            the pool (anchor z and two projected states; the second
            half of ter Braak & Vrugt's sampler; default 0.1,
            ``gammas = 1.7``).
        de_noise: scale of ter Braak's additive full-rank noise term
            ``e`` relative to the per-dimension complement spread
            (default 1e-2).  This term is LOAD-BEARING when
            ``nwalkers <= ndim``: difference vectors alone span only
            the affine hull of the states ever visited, and with few
            walkers that hull is a proper subspace — the diagonal noise
            is what lets the chain (and then the archive) escape it.
            Do not set it to 0 in that regime.
        archive_size: ring-buffer capacity in states (default
            ``max(10 * nwalkers, 1024)``, rounded up to a multiple of
            ``update_rows``).
        update_rows: ensemble rows folded into the archive per proposal
            (default 64; clamped to the local ensemble size).
        archive_init: optional ``(n, ndim)`` array of states (e.g. a
            prior sample) pre-loaded into the archive.  In the
            few-walker regime this skips the slow ``de_noise``
            bootstrap entirely: difference vectors are full-rank from
            step one instead of accumulating hull-escaping directions
            one random-walk excursion at a time.  Validity is the same
            adaptation-on-history argument — seeded rows are just
            history the chain did not have to generate itself (ter
            Braak & Vrugt 2008 start Z from an over-dispersed initial
            sample the same way).  Rows beyond ``archive_size`` are
            dropped (keep the seed no larger than the capacity).

    For ``nwalkers < 2 * ndim`` — the use case this move exists for —
    pass ``live_dangerously=True``.  Mixing across the initially
    unspanned directions starts as a small-step random walk driven by
    ``de_noise`` and accelerates as hull-escaping states enter the
    archive; budget steps accordingly (it is slower than the
    full-ensemble regime, not magic).
    """

    wants_carry = True
    blendable = False
    _param_shard_ok = False

    def __init__(self, sigma=1.0e-5, gamma0=None, g1_prob=0.1,
                 snooker_prob=0.1, gammas=1.7, de_noise=1.0e-2,
                 archive_size=None, update_rows=64, archive_init=None,
                 **kwargs):
        self.sigma = float(sigma)
        self.gamma0 = gamma0
        self.g1_prob = float(g1_prob)
        if not 0.0 <= self.g1_prob <= 1.0:
            raise ValueError("g1_prob must be in [0, 1]")
        self.snooker_prob = float(snooker_prob)
        if not 0.0 <= self.snooker_prob <= 1.0:
            raise ValueError("snooker_prob must be in [0, 1]")
        self.gammas = float(gammas)
        self.de_noise = float(de_noise)
        if self.de_noise < 0.0:
            raise ValueError("de_noise must be >= 0")
        self.archive_size = archive_size
        self.update_rows = int(update_rows)
        if self.update_rows < 1:
            raise ValueError("update_rows must be >= 1")
        if archive_init is not None:
            import numpy as np

            archive_init = np.asarray(archive_init, dtype=np.float32)
            if archive_init.ndim != 2:
                raise ValueError(
                    "archive_init must be a (n, ndim) array of states"
                )
        self.archive_init = archive_init
        super().__init__(**kwargs)

    def _capacity(self, nwalkers):
        k = self.archive_size
        if k is None:
            k = max(10 * nwalkers, 1024)
        u = self.update_rows
        return ((int(k) + u - 1) // u) * u  # multiple of update_rows

    def init_carry(self, nwalkers, ndim):
        k = self._capacity(nwalkers)
        z = jnp.zeros((k, ndim), dtype=jnp.float32)
        filled = 0
        if self.archive_init is not None:
            seed = self.archive_init
            if seed.shape[1] != ndim:
                raise ValueError(
                    f"archive_init has {seed.shape[1]} columns; the "
                    f"sampler has ndim={ndim}"
                )
            filled = min(seed.shape[0], k)
            z = z.at[:filled].set(jnp.asarray(seed[:filled]))
        return {
            "z": z,
            "filled": jnp.asarray(filled, dtype=jnp.int32),
            # Next write lands after the seed (or at 0 when it exactly
            # fills the ring).
            "ptr": jnp.asarray(filled % k, dtype=jnp.int32),
            "t": jnp.zeros((), dtype=jnp.int32),  # update counter
        }

    def get_proposal(self, key, s, c_parts, model, carry=None):
        c = jnp.concatenate(c_parts, axis=0)
        ns, ndim = s.shape
        nc = c.shape[0]
        dtype = s.dtype

        # Pair pool: frozen complement + the filled part of the archive.
        # Unfilled rows sit past n_avail and are never drawn.
        pool = jnp.concatenate([c, carry["z"].astype(dtype)], axis=0)
        n_avail = nc + carry["filled"]

        (
            key_i, key_j, key_g, key_1, key_e, key_s, key_a, key_b, key_c
        ) = jax.random.split(key, 9)
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
        if self.de_noise > 0.0:
            # ter Braak's additive full-rank term e: diagonal Gaussian
            # noise scaled by the frozen complement's per-dimension
            # spread.  Symmetric (zero Hastings factor) and independent
            # of the walker's own position.  This is what lets the
            # chain leave the affine hull of previously-visited states
            # when nwalkers <= ndim (difference vectors cannot).
            spread = jnp.std(c, axis=0)
            # Floor against axis-aligned collapse (a dimension constant
            # across the complement would otherwise get zero noise and
            # stay frozen forever).
            spread = jnp.maximum(spread, 0.01 * jnp.mean(spread) + 1e-12)
            q = q + self.de_noise * spread * jax.random.normal(
                key_e, (ns, ndim), dtype=dtype
            )
        factors = jnp.zeros(ns, dtype=dtype)

        if self.snooker_prob > 0.0:
            # Snooker update from the pool (ter Braak & Vrugt sec. 3.2;
            # same algebra as DESnookerMove, de_snooker.py:128-139):
            # anchor z, direction u = (s - z)/|s - z|, step along u by
            # gammas * u.(z1 - z2), Metropolis factor |q-z|^(d-1)/|s-z|^(d-1).
            a = jax.random.randint(key_a, (ns,), 0, n_avail)
            b = jax.random.randint(key_b, (ns,), 0, n_avail)
            e = jax.random.randint(key_c, (ns,), 0, n_avail)
            z = pool[a]
            delta = s - z
            # The pool can contain an archived copy of the walker's own
            # past state; clamp so a zero separation degrades to a
            # harmless self-proposal instead of NaN.
            norm = jnp.sqrt(
                jnp.maximum(jnp.sum(delta * delta, axis=-1), 1e-24)
            )
            u_dir = delta / norm[:, None]
            proj = jnp.einsum("ij,ij->i", u_dir, pool[b] - pool[e])
            gp = self.gammas * proj
            q_sn = s + u_dir * gp[:, None]
            f_sn = (model.global_ndim(ndim) - 1.0) * (
                jnp.log(jnp.maximum(jnp.abs(norm + gp), 1e-24))
                - jnp.log(norm)
            )
            use_sn = jax.random.uniform(key_s, (ns,), dtype=dtype) < (
                self.snooker_prob
            )
            q = jnp.where(use_sn[:, None], q_sn, q)
            factors = jnp.where(use_sn, f_sn, factors)

        return q, factors

    def update_carry(self, carry, state, model):
        """Fold a strided, rotating ensemble subsample into the ring.

        Under walker sharding every shard contributes an equal slice
        (all_gather keeps the replicated carry bit-identical across
        shards) and no shard is ever dropped.  The write is a wrap-safe
        scatter at indices ``(ptr + arange(nrows)) % capacity``, so no
        alignment invariant between ``update_rows``, the shard count,
        and the capacity is needed.
        """
        coords = state.coords
        nw_local = coords.shape[0]
        ptr = carry["ptr"]

        if model.axis_name is not None:
            shards = max(1, (model.nwalkers or nw_local) // nw_local)
        else:
            shards = 1
        # Distinct local rows only (duplicates would enter the pool as
        # zero difference vectors); every shard contributes at least one.
        u_loc = min(max(1, self.update_rows // shards), nw_local)
        stride = max(1, nw_local // u_loc)
        # Advance the subsample base by ONE walker per update (the
        # update counter, not the write pointer: ptr advances by a
        # multiple of stride, which would pin the subsample to a single
        # residue class forever — a fixed quarter of the ensemble was
        # all that ever reached the archive).  Over `stride` consecutive
        # updates every walker is visited.
        idx = (
            carry["t"] + jnp.arange(u_loc, dtype=jnp.int32) * stride
        ) % nw_local
        rows = coords[idx]
        if model.axis_name is not None:
            rows = jax.lax.all_gather(
                rows, model.axis_name, axis=0, tiled=True
            )
        rows = rows.astype(jnp.float32)
        nrows = rows.shape[0]  # static: shards * u_loc

        k = carry["z"].shape[0]
        if nrows > k:
            raise ValueError(
                f"archive_size ({k}) is smaller than one update's rows "
                f"({nrows}); raise archive_size or lower update_rows — "
                "a same-scatter wrap would drop rows nondeterministically"
            )
        slots = (ptr + jnp.arange(nrows, dtype=jnp.int32)) % k
        z = carry["z"].at[slots].set(rows)
        return {
            "z": z,
            "filled": jnp.minimum(carry["filled"] + nrows, k),
            "ptr": (ptr + nrows) % k,
            "t": carry["t"] + 1,
        }
