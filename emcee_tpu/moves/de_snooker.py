"""Snooker differential-evolution move (Ter Braak & Vrugt 2008).

Matches the reference (``/root/reference/src/emcee/moves/de_snooker.py:10-46``):
forces ``nsplits=4``; for each walker draws one point from each of the three
complementary groups, randomly shuffles them into ``(z, z1, z2)``, projects
along ``u = (s - z)/|s - z|`` and proposes
``q = s + gammas * u * (u.z1 - u.z2)`` with Metropolis factor
``(ndim - 1) * (log|q - z| - log|s - z|)``.

Two execution modes for the per-walker draws:

* ``pair_mode="random"`` (reference-faithful): one uniform member of each
  complementary group per walker (three random row gathers) plus a
  per-walker 6-way permutation lookup replacing the reference's in-place
  shuffle (``de_snooker.py:38-45``).
* ``pair_mode="roll"``: each group contributes ``c[(i + shift) % nc]``
  under one random shift per group per half-step, and the (z, z1, z2) role
  assignment is one random permutation per half-step instead of per
  walker.  Both are exogenous randomness independent of the chain state,
  so detailed balance is preserved; no gathers remain in the hot loop and
  the four scalar uniforms ride the engine's fused per-step RNG draw.
  This is the TPU performance configuration (pairs with
  ``randomize_split=False`` for the fully static-slice blocked engine).
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
        pair_mode: ``"random"`` (reference-faithful gathers) or ``"roll"``
            (gather-free circular pairing, see module docstring).
    """

    tunable = True

    def __init__(self, gammas=1.7, pair_mode="random", **kwargs):
        self.gammas = float(gammas)
        if pair_mode not in ("random", "roll"):
            raise ValueError(f"unknown pair_mode: {pair_mode!r}")
        self.pair_mode = pair_mode
        # Reference forces nsplits=4 (three disjoint complement groups,
        # de_snooker.py:28).  In roll mode nsplits=2 is also supported:
        # the three points come from three independent shifts of the one
        # complementary half — still drawn from the frozen complement, so
        # detailed balance is untouched, and the step count halves (the
        # workload-3 mixture performance configuration).
        kwargs.setdefault("nsplits", 4)
        if kwargs["nsplits"] != 4 and not (
            pair_mode == "roll" and kwargs["nsplits"] == 2
        ):
            raise ValueError(
                "DESnookerMove needs nsplits=4 (or 2 with pair_mode='roll')"
            )
        super().__init__(**kwargs)

    def n_extra_uniforms(self, ng, nc):
        # Roll mode needs 4 scalars (role permutation + 3 group shifts);
        # folding them into the step's single fused RNG draw keeps the
        # whole proposal at zero extra RNG kernel launches.
        return 4 if self.pair_mode == "roll" else 0

    def _draw_roll(self, key, s, c_parts, extra):
        ns = s.shape[0]
        if extra is not None:
            u4 = extra[:4]
        else:
            u4 = jax.random.uniform(key, (4,), dtype=s.dtype)
        parts = [c_parts[i % len(c_parts)] for i in range(3)]
        picks = []
        for u_k, cpart in zip(u4[1:], parts):
            shift = (u_k * cpart.shape[0]).astype(jnp.int32)
            picks.append(jnp.roll(cpart, -shift, axis=0)[:ns])
        if len(c_parts) == 1:
            # All three draws come from the same complement half under
            # i.i.d. shifts — the (z, z1, z2) roles are already
            # exchangeable, so the role shuffle is redundant (and its
            # (3, ns, ndim) stack + gather is the expensive part).
            return picks[0], picks[1], picks[2]
        perm_idx = jnp.minimum((u4[0] * 6).astype(jnp.int32), 5)
        order = jnp.asarray(_PERMS3)[perm_idx]  # (3,)
        w = jnp.stack(picks, axis=0)  # (3, ns, ndim)
        return w[order[0]], w[order[1]], w[order[2]]

    def _draw_random(self, key, s, c_parts):
        ns = s.shape[0]
        keys = jax.random.split(key, 4)
        # One uniformly random member of each complementary group per
        # walker, then a per-walker shuffle of the three draws (indexing a
        # static table of the 3! permutations).
        w = jnp.stack(
            [
                c[jax.random.randint(k, (ns,), 0, c.shape[0])]
                for k, c in zip(keys[:3], c_parts)
            ],
            axis=1,
        )  # (ns, 3, ndim)
        perm_idx = jax.random.randint(keys[3], (ns,), 0, 6)
        order = jnp.asarray(_PERMS3)[perm_idx]  # (ns, 3)
        w = jnp.take_along_axis(w, order[:, :, None], axis=1)
        return w[:, 0], w[:, 1], w[:, 2]

    def get_proposal(self, key, s, c_parts, model, extra=None, scale=None):
        ns, ndim = s.shape
        gammas = self.gammas if scale is None else self.gammas * scale
        if self.pair_mode == "roll":
            z, z1, z2 = self._draw_roll(key, s, c_parts, extra)
        else:
            z, z1, z2 = self._draw_random(key, s, c_parts)

        # All dim-reductions psum over parameter shards (no-ops otherwise);
        # the draws above use walker-folded keys / fused uniforms, so every
        # parameter shard picks the same partners.
        delta = s - z
        norm2 = model.psum_params(jnp.sum(delta**2, axis=-1))
        norm = jnp.sqrt(norm2)
        u = delta / norm[:, None]
        proj = model.psum_params(jnp.einsum("ij,ij->i", u, z1 - z2))
        gp = gammas * proj
        q = s + u * gp[:, None]
        # q - z = delta + gp*u = (norm + gp)*u with |u| = 1, so
        # |q - z| = |norm + gp| exactly — no third reduction pass needed.
        metropolis = jnp.log(jnp.abs(norm + gp)) - jnp.log(norm)
        return q, (model.global_ndim(ndim) - 1.0) * metropolis
