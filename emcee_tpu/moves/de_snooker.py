"""Snooker differential-evolution move (Ter Braak & Vrugt 2008).

Matches the reference (``/root/reference/src/emcee/moves/de_snooker.py:10-46``):
forces ``nsplits=4``; for each walker draws one point from each of the three
complementary groups, randomly shuffles them into ``(z, z1, z2)``, projects
along ``u = (s - z)/|s - z|`` and proposes
``q = s + gammas * u * (u.z1 - u.z2)`` with Metropolis factor
``(ndim - 1) * (log|q - z| - log|s - z|)``.

The reference's per-walker Python loop (``de_snooker.py:38-45``) becomes a
vectorized gather + a 6-way permutation lookup (shuffling 3 elements =
indexing a static table of the 3! permutations).
"""

from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from .red_blue import RedBlueMove

__all__ = ["DESnookerMove"]

_PERMS3 = np.array(list(itertools.permutations(range(3))), dtype=np.int32)


class DESnookerMove(RedBlueMove):
    """Snooker DE proposal.

    Args:
        gammas: mean stretch factor (default 1.7 per the reference).
    """

    def __init__(self, gammas=1.7, **kwargs):
        self.gammas = float(gammas)
        kwargs["nsplits"] = 4
        super().__init__(**kwargs)

    def get_proposal(self, key, s, c_parts, model):
        ns, ndim = s.shape
        keys = jax.random.split(key, 4)
        # One uniformly random member of each complementary group per walker.
        w = jnp.stack(
            [
                c[jax.random.randint(k, (ns,), 0, c.shape[0])]
                for k, c in zip(keys[:3], c_parts)
            ],
            axis=1,
        )  # (ns, 3, ndim)
        # Random shuffle of the three draws (reference shuffles w in place).
        perm_idx = jax.random.randint(keys[3], (ns,), 0, 6)
        order = jnp.asarray(_PERMS3)[perm_idx]  # (ns, 3)
        w = jnp.take_along_axis(w, order[:, :, None], axis=1)
        z, z1, z2 = w[:, 0], w[:, 1], w[:, 2]

        # All dim-reductions psum over parameter shards (no-ops otherwise);
        # the random index draws above use walker-folded keys, so every
        # parameter shard picks the same partners.
        delta = s - z
        norm2 = model.psum_params(jnp.sum(delta**2, axis=-1))
        norm = jnp.sqrt(norm2)
        u = delta / norm[:, None]
        proj = model.psum_params(
            jnp.einsum("ij,ij->i", u, z1)
        ) - model.psum_params(jnp.einsum("ij,ij->i", u, z2))
        q = s + u * (self.gammas * proj)[:, None]
        qz2 = model.psum_params(jnp.sum((q - z) ** 2, axis=-1))
        metropolis = 0.5 * jnp.log(qz2) - jnp.log(norm)
        return q, (model.global_ndim(ndim) - 1.0) * metropolis
