"""Red-blue ensemble-split proposal engine.

TPU-native re-design of the reference's ``RedBlueMove``
(``/root/reference/src/emcee/moves/red_blue.py:11-106``).  The algorithm is
identical — split the ensemble into ``nsplits`` groups, update each group
against the frozen complementary groups so detailed balance holds (Foreman-
Mackey et al. 2013, Algorithm 2) — but the execution model is fused XLA:

* the per-walker Python accept loop (reference ``red_blue.py:96-101``)
  becomes one vectorized ``log U < lnpdiff`` compare;
* with ``randomize_split=True`` (reference default), group membership is a
  key-derived permutation applied as a gather (the reference shuffles an
  index array with the global MT19937 stream, ``red_blue.py:77-80``);
* with ``randomize_split=False``, the engine takes a gather-free fast
  path: fixed contiguous-half membership (group j = walkers
  [j*ng, (j+1)*ng)) makes group select/update static 2-D slices — **no
  gathers, no scatters, no sort** in the hot loop.  This is the
  performance configuration: fixed split membership is the original
  Goodman & Weare (2010) parallel algorithm and preserves detailed
  balance; the shuffle only decorrelates group assignments.
* under walker sharding, membership is drawn per shard (every shard
  contributes equally to every group — statistically equivalent to a
  global shuffle) and complementary groups are all-gathered over the mesh
  axis so each shard proposes against the full global complement.

Group shapes are static: ``nwalkers_local`` must divide by ``nsplits``
(checked at trace time).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .base import Move, ScaleTunable, tree_where

__all__ = ["RedBlueMove"]


class RedBlueMove(ScaleTunable, Move):
    """Abstract parallelizable ensemble move.

    Args:
        nsplits: Number of sub-ensembles (reference default 2).
        randomize_split: Shuffle group membership every proposal
            (reference default True).  ``False`` enables the gather-free
            blocked fast path.
        live_dangerously: Skip the ``nwalkers >= 2 * ndim`` degeneracy guard
            (reference ``red_blue.py:64-70``).
        tune_target: optional target acceptance rate; with
            ``run_mcmc(..., tune=True)`` the move's proposal scale adapts
            by Robbins-Monro toward it (supported by the scale-
            parameterized moves: Stretch, DE, Snooker, Walk, Side — the
            reference exposes the tune hook, ``moves/move.py:9-10``, but
            ships no tuning move).
        tune_rate: adaptation step size (decays as ``1/sqrt(t)``).

    Subclasses implement ``get_proposal(key, s, c_parts) -> (q, factors)``
    where ``s`` is the ``(ns, ndim)`` group being updated and ``c_parts`` is
    a tuple of the ``nsplits - 1`` complementary group arrays (each already
    globally gathered when running sharded).  Moves that support
    acceptance-targeted tuning set ``tunable = True`` and accept a traced
    ``scale`` keyword (a positive scalar multiplier on their proposal
    scale; ``None`` means untuned).
    """

    #: subclasses that accept the ``scale`` keyword opt in.
    tunable = False
    #: subclasses whose proposal reads the move carry (adaptive moves —
    #: e.g. DIMEMove's running proposal-distribution moments) opt in;
    #: their ``get_proposal`` receives a ``carry`` keyword and
    #: :meth:`update_carry` runs once per proposal, after all splits.
    wants_carry = False
    #: moves that couple parameter dimensions (full-covariance or
    #: whole-vector indexing) set this False; checked in :meth:`propose`
    #: when the parameter axis is sharded.
    _param_shard_ok = True
    #: False for moves whose update is not a (q, factors) proposal
    #: (e.g. the slice move) — they cannot participate in BlendedMove's
    #: shared-evaluation blending.
    blendable = True

    def __init__(self, nsplits=2, randomize_split=True, live_dangerously=False,
                 tune_target=None, tune_rate=0.2):
        self.nsplits = int(nsplits)
        self.randomize_split = bool(randomize_split)
        self.live_dangerously = bool(live_dangerously)
        if tune_target is not None and not self.tunable:
            raise ValueError(
                f"{type(self).__name__} does not support tune_target "
                "(no adaptable proposal scale)"
            )
        self.tune_target = tune_target
        self.tune_rate = float(tune_rate)

    # init_carry / tune come from the ScaleTunable mixin.

    def get_proposal(
        self, key, s, c_parts, model
    ) -> Tuple[jax.Array, jax.Array]:
        raise NotImplementedError(
            "The proposal must be implemented by subclasses"
        )

    def n_extra_uniforms(self, ng: int, nc: int) -> int:
        """Extra per-split uniforms to fold into the step's single RNG
        draw (0 disables; see ``propose``).  Moves that opt in receive the
        slice as the ``extra`` keyword of ``get_proposal``."""
        return 0

    def propose(self, key, state, model, carry):
        nwalkers, ndim = state.coords.shape
        nglobal = model.nwalkers or nwalkers
        if nglobal < 2 * model.global_ndim(ndim) and not self.live_dangerously:
            raise RuntimeError(
                "It is unadvisable to use a red-blue move with fewer "
                "walkers than twice the number of dimensions."
            )
        if nwalkers % self.nsplits != 0:
            raise ValueError(
                f"nwalkers per device ({nwalkers}) must be divisible by "
                f"nsplits ({self.nsplits})"
            )
        if model.param_axis is not None and not self._param_shard_ok:
            raise NotImplementedError(
                f"{type(self).__name__} couples parameter dimensions "
                "and does not support parameter-axis sharding"
            )
        ng = nwalkers // self.nsplits

        # Decorrelate walker shards; per-walker randomness stays identical
        # across parameter shards (see Model.param_axis).
        key = model.fold_walker(key)
        keys = jax.random.split(key, 2 + self.nsplits)
        key_perm, key_acc, split_keys = keys[0], keys[1], keys[2:]
        # One fused draw for every split's acceptance uniforms — plus any
        # extra uniforms the concrete move asks for via n_extra_uniforms
        # (e.g. stretch z-draws + roll shifts), so the whole proposal
        # consumes a single RNG kernel per step.
        dtype = state.coords.dtype
        n_extra = self.n_extra_uniforms(ng, nwalkers - ng)
        u_all = jax.random.uniform(
            key_acc, (self.nsplits, ng + n_extra), dtype=dtype
        )
        log_acc_u = jnp.log(u_all[:, :ng])
        extra_u = u_all[:, ng:] if n_extra else None

        # Traced scale multiplier from the tuning carry (see tune()).
        scale = self._tuned_scale(carry, dtype)

        if self.randomize_split:
            return self._propose_shuffled(
                key_perm, split_keys, log_acc_u, extra_u, state, model,
                carry, ng, scale
            )
        return self._propose_blocked(
            split_keys, log_acc_u, extra_u, state, model, carry, ng, scale
        )

    def update_carry(self, carry, state, model):
        """Post-proposal adaptation of the move carry (``wants_carry``
        moves only); ``state`` is the post-accept ensemble.  Runs every
        proposal, independent of the ``tune`` flag — adaptive-proposal
        moves (DIME) adapt always, by construction."""
        return carry

    def _inner(self, k, s, c_parts, lp_s, blobs_s, log_u, model,
               extra=None, scale=None, carry=None):
        """Propose/evaluate/accept for one group.

        Returns ``(sel_coords, sel_lp, sel_blobs, accepted, stats)``; the
        fifth slot is an optional per-split tuning-statistics pytree
        (``None`` here).  A subclass whose update produces adaptation
        signals beyond the acceptance mask (e.g. the slice move's
        expansion/contraction counts) returns them there, and the engine
        hands the collected per-split list to :meth:`_fold_split_stats`
        after all splits — tuning data travels the traced return path,
        never mutable object state.
        """
        if model.axis_name is not None:
            # Each shard proposes against the full global complement.
            c_parts = tuple(
                jax.lax.all_gather(c, model.axis_name, axis=0, tiled=True)
                for c in c_parts
            )
        kw = {}
        if extra is not None:
            kw["extra"] = extra
        if scale is not None:
            kw["scale"] = scale
        if self.wants_carry:
            kw["carry"] = carry
        q, factors = self.get_proposal(k, s, c_parts, model, **kw)
        new_lp, new_blobs = model.compute_log_prob(q)
        lnpdiff = factors + new_lp - lp_s
        acc = log_u < lnpdiff
        sel_coords = jnp.where(acc[:, None], q, s)
        sel_lp = jnp.where(acc, new_lp, lp_s)
        sel_blobs = blobs_s
        if new_blobs is not None:
            sel_blobs = tree_where(acc, new_blobs, blobs_s)
        return sel_coords, sel_lp, sel_blobs, acc, None

    def _fold_split_stats(self, carry, stats, model):
        """Fold the per-split ``stats`` payloads (see :meth:`_inner`)
        into the move carry; runs once per proposal, after all splits.
        Default: ignore them."""
        return carry

    def _propose_shuffled(
        self, key_perm, split_keys, log_acc_u, extra_u, state, model,
        carry, ng, scale=None
    ):
        """Reference-faithful path: random membership via permutation."""
        nwalkers = state.coords.shape[0]
        perm = jax.random.permutation(key_perm, nwalkers)
        groups = perm.reshape(ng, self.nsplits).T  # strided grouping

        coords = state.coords
        log_prob = state.log_prob
        blobs = state.blobs
        accepted = jnp.zeros(nwalkers, dtype=bool)
        split_stats = []

        for split in range(self.nsplits):
            idx = groups[split]
            s = coords[idx]
            c_parts = tuple(
                coords[groups[j]]
                for j in range(self.nsplits)
                if j != split
            )
            blobs_s = (
                jax.tree_util.tree_map(lambda b: b[idx], blobs)
                if blobs is not None
                else None
            )
            sel_c, sel_lp, sel_b, acc, stats = self._inner(
                split_keys[split],
                s,
                c_parts,
                log_prob[idx],
                blobs_s,
                log_acc_u[split],
                model,
                extra=None if extra_u is None else extra_u[split],
                scale=scale,
                carry=carry,
            )
            coords = coords.at[idx].set(sel_c)
            log_prob = log_prob.at[idx].set(sel_lp)
            if sel_b is not None:
                if blobs is None:
                    raise ValueError(
                        "If you start sampling with a given log_prob, you "
                        "also need to provide the current list of blobs at "
                        "that position."
                    )
                blobs = jax.tree_util.tree_map(
                    lambda b, n: b.at[idx].set(n), blobs, sel_b
                )
            accepted = accepted.at[idx].set(acc)
            if stats is not None:
                split_stats.append(stats)

        new_state = state._replace(
            coords=coords, log_prob=log_prob, blobs=blobs
        )
        if self.wants_carry:
            carry = self.update_carry(carry, new_state, model)
        if split_stats:
            carry = self._fold_split_stats(carry, split_stats, model)
        return new_state, accepted, carry

    def _propose_blocked(
        self, split_keys, log_acc_u, extra_u, state, model, carry, ng,
        scale=None
    ):
        """Gather-free path: fixed contiguous-block membership.

        Group j = walkers [j*ng, (j+1)*ng).  Contiguous 2-D slices keep
        XLA layouts clean (a strided ``i % nsplits`` view materializes a
        3-D intermediate whose (nsplits, ndim) minor dims tile-pad to
        (8, 128) — a 25x memory blowup at small ndim) and feed the Pallas
        kernel without copies.  Membership choice is arbitrary for a
        fixed split, so this is statistically identical to the
        reference's strided assignment.
        """
        ns = self.nsplits
        coords = state.coords
        log_prob = state.log_prob
        blobs = state.blobs
        accs = []
        split_stats = []

        def blk(arr, j):
            return arr[j * ng : (j + 1) * ng]

        for split in range(ns):
            s = blk(coords, split)
            c_parts = tuple(
                blk(coords, j) for j in range(ns) if j != split
            )
            blobs_s = (
                jax.tree_util.tree_map(lambda b: blk(b, split), blobs)
                if blobs is not None
                else None
            )
            sel_c, sel_lp, sel_b, acc, stats = self._inner(
                split_keys[split],
                s,
                c_parts,
                blk(log_prob, split),
                blobs_s,
                log_acc_u[split],
                model,
                extra=None if extra_u is None else extra_u[split],
                scale=scale,
                carry=carry,
            )
            lo = split * ng
            coords = jax.lax.dynamic_update_slice(
                coords, sel_c, (lo, 0)
            )
            log_prob = jax.lax.dynamic_update_slice(
                log_prob, sel_lp, (lo,)
            )
            if sel_b is not None:
                if blobs is None:
                    raise ValueError(
                        "If you start sampling with a given log_prob, you "
                        "also need to provide the current list of blobs at "
                        "that position."
                    )
                blobs = jax.tree_util.tree_map(
                    lambda b, n: jax.lax.dynamic_update_slice(
                        b, n, (lo,) + (0,) * (b.ndim - 1)
                    ),
                    blobs,
                    sel_b,
                )
            accs.append(acc)
            if stats is not None:
                split_stats.append(stats)

        new_state = state._replace(
            coords=coords, log_prob=log_prob, blobs=blobs
        )
        if self.wants_carry:
            carry = self.update_carry(carry, new_state, model)
        if split_stats:
            carry = self._fold_split_stats(carry, split_stats, model)
        return new_state, jnp.concatenate(accs), carry
