"""Red-blue ensemble-split proposal engine.

TPU-native re-design of the reference's ``RedBlueMove``
(``/root/reference/src/emcee/moves/red_blue.py:11-106``).  The algorithm is
identical — split the ensemble into ``nsplits`` groups, update each group
against the frozen complementary groups so detailed balance holds (Foreman-
Mackey et al. 2013, Algorithm 2) — but the execution model is fused XLA:

* the per-walker Python accept loop (reference ``red_blue.py:96-101``)
  becomes one vectorized ``log U < lnpdiff`` compare;
* masked scatter of accepted proposals is a gather/`at[].set` pair driven by
  a key-derived permutation (the reference shuffles an index array with the
  global MT19937 stream, ``red_blue.py:77-80``);
* under walker sharding, the permutation is drawn per shard (every shard
  contributes equally to every split group — statistically equivalent to a
  global shuffle) and the complementary groups are all-gathered over the
  mesh axis so each shard proposes against the full global complement.

Group shapes are static: ``nwalkers_local`` must divide by ``nsplits``
(checked at trace time), and groups are the strided slices ``perm[j::
nsplits]`` matching the reference's ``arange(n) % nsplits`` membership.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp

from .base import Move, tree_where

__all__ = ["RedBlueMove"]


class RedBlueMove(Move):
    """Abstract parallelizable ensemble move.

    Args:
        nsplits: Number of sub-ensembles (reference default 2).
        randomize_split: Shuffle group membership every proposal
            (reference default True).
        live_dangerously: Skip the ``nwalkers >= 2 * ndim`` degeneracy guard
            (reference ``red_blue.py:64-70``).

    Subclasses implement ``get_proposal(key, s, c_parts) -> (q, factors)``
    where ``s`` is the ``(ns, ndim)`` group being updated and ``c_parts`` is
    a tuple of the ``nsplits - 1`` complementary group arrays (each already
    globally gathered when running sharded).
    """

    def __init__(self, nsplits=2, randomize_split=True, live_dangerously=False):
        self.nsplits = int(nsplits)
        self.randomize_split = bool(randomize_split)
        self.live_dangerously = bool(live_dangerously)

    def get_proposal(self, key, s, c_parts) -> Tuple[jax.Array, jax.Array]:
        raise NotImplementedError(
            "The proposal must be implemented by subclasses"
        )

    def propose(self, key, state, model, carry):
        nwalkers, ndim = state.coords.shape
        nglobal = model.nwalkers or nwalkers
        if nglobal < 2 * ndim and not self.live_dangerously:
            raise RuntimeError(
                "It is unadvisable to use a red-blue move with fewer "
                "walkers than twice the number of dimensions."
            )
        if nwalkers % self.nsplits != 0:
            raise ValueError(
                f"nwalkers per device ({nwalkers}) must be divisible by "
                f"nsplits ({self.nsplits})"
            )
        ng = nwalkers // self.nsplits

        key_perm, key = jax.random.split(key)
        if model.axis_name is not None:
            # Decorrelate shards; the incoming key is replicated.
            shard = jax.lax.axis_index(model.axis_name)
            key = jax.random.fold_in(key, shard)
            key_perm = jax.random.fold_in(key_perm, shard)
        if self.randomize_split:
            perm = jax.random.permutation(key_perm, nwalkers)
        else:
            perm = jnp.arange(nwalkers)
        # Strided grouping: group j = perm[j::nsplits] (matches the
        # reference's `arange(n) % nsplits` membership pattern).
        groups = perm.reshape(ng, self.nsplits).T  # (nsplits, ng)

        coords = state.coords
        log_prob = state.log_prob
        blobs = state.blobs
        accepted = jnp.zeros(nwalkers, dtype=bool)

        split_keys = jax.random.split(key, 2 * self.nsplits)
        for split in range(self.nsplits):
            idx = groups[split]
            s = coords[idx]
            c_parts = tuple(
                coords[groups[j]]
                for j in range(self.nsplits)
                if j != split
            )
            if model.axis_name is not None:
                # Each shard proposes against the full global complement.
                c_parts = tuple(
                    jax.lax.all_gather(
                        c, model.axis_name, axis=0, tiled=True
                    )
                    for c in c_parts
                )

            k_prop = split_keys[2 * split]
            k_acc = split_keys[2 * split + 1]
            q, factors = self.get_proposal(k_prop, s, c_parts)
            new_log_prob, new_blobs = model.compute_log_prob(q)

            lnpdiff = factors + new_log_prob - log_prob[idx]
            acc = jnp.log(
                jax.random.uniform(k_acc, (ng,), dtype=lnpdiff.dtype)
            ) < lnpdiff

            coords = coords.at[idx].set(jnp.where(acc[:, None], q, s))
            log_prob = log_prob.at[idx].set(
                jnp.where(acc, new_log_prob, log_prob[idx])
            )
            if new_blobs is not None:
                old_sub = jax.tree_util.tree_map(lambda b: b[idx], blobs)
                new_sub = tree_where(acc, new_blobs, old_sub)
                blobs = jax.tree_util.tree_map(
                    lambda b, n: b.at[idx].set(n), blobs, new_sub
                )
            accepted = accepted.at[idx].set(acc)

        new_state = state._replace(
            coords=coords, log_prob=log_prob, blobs=blobs
        )
        return new_state, accepted, carry
