"""Move protocol.

The reference's ``Move`` (``/root/reference/src/emcee/moves/move.py:8-45``)
mutates state arrays in place with boolean-mask assignment and keeps tuning
state on ``self``.  Under jit neither is possible, so the TPU-native protocol
is purely functional:

* ``propose(key, state, model, carry) -> (state, accepted, carry)`` — a
  traceable pure function.  ``accepted`` is a ``(nwalkers_local,)`` bool.
* per-move mutable state (e.g. the ``sequential`` dim counter of
  ``GaussianMove``, reference ``gaussian.py:99-101``) lives in ``carry``, a
  small pytree created by ``init_carry`` and threaded through the scan.
* ``tune(carry, state, accepted, model=None) -> carry`` — optional
  adaptation hook (reference ``move.py:9-10``), also pure; ``model``
  carries the mesh-axis names for cross-shard reductions.

Masked acceptance-update is branch-free ``jnp.where`` select instead of the
reference's fancy-indexed scatter.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "Move",
    "ScaleTunable",
    "accept_update",
    "tree_where",
    "robbins_monro_step",
    "robbins_monro_tune",
]


def robbins_monro_step(carry, err, rate):
    """One Robbins-Monro update of the ``{log_adj, t}`` carry: nudge
    ``log_adj`` by ``err`` with a ``rate / sqrt(1 + t)`` step
    (diminishing adaptation).  The decay schedule and clip bounds live
    here so every tuning signal (acceptance-rate targeting below,
    expansion-balance in the slice move) shares one implementation."""
    t = carry["t"]
    lr = rate / jnp.sqrt(1.0 + t.astype(jnp.float32))
    return {
        **carry,
        "log_adj": jnp.clip(carry["log_adj"] + lr * err, -10.0, 10.0),
        "t": t + 1,
    }


def robbins_monro_tune(carry, accepted, target, rate, model=None):
    """Shared Robbins-Monro acceptance-targeting update.

    Nudges ``carry["log_adj"]`` toward the acceptance rate ``target``.
    The rate is averaged over the *global* ensemble: under walker
    sharding a shard-local mean would adapt each shard's copy of the
    (replicated) carry differently, corrupting the tuned scale.
    """
    acc_rate = jnp.mean(accepted.astype(jnp.float32))
    if model is not None and model.axis_name is not None:
        acc_rate = jax.lax.pmean(acc_rate, model.axis_name)
    return robbins_monro_step(carry, acc_rate - target, rate)


class ScaleTunable:
    """Mixin: the Robbins-Monro tunable-scale carry protocol.

    A move sets ``self.tune_target`` / ``self.tune_rate`` and gains the
    ``{log_adj, t}`` carry, the ``tune()`` hook, and ``_tuned_scale``
    (the ``exp(log_adj)`` multiplier).  Used by the red-blue family and
    the gradient moves so the tuning protocol lives in exactly one
    place.
    """

    tune_target = None
    tune_rate = 0.2

    def init_carry(self, nwalkers, ndim):
        if self.tune_target is None:
            return ()
        return {
            "log_adj": jnp.zeros((), dtype=jnp.float32),
            "t": jnp.zeros((), dtype=jnp.int32),
        }

    def tune(self, carry, state, accepted, model=None):
        if self.tune_target is None:
            return carry
        return robbins_monro_tune(
            carry, accepted, self.tune_target, self.tune_rate, model
        )

    @staticmethod
    def _tuned_scale(carry, dtype):
        """The carry's scale multiplier, or None when untuned."""
        if isinstance(carry, dict) and "log_adj" in carry:
            return jnp.exp(carry["log_adj"]).astype(dtype)
        return None


def tree_where(mask: jax.Array, new: Any, old: Any) -> Any:
    """Per-walker select over a blob pytree; mask has shape (nwalkers,)."""
    if old is None:
        return new

    def sel(n, o):
        m = mask.reshape((-1,) + (1,) * (n.ndim - 1))
        return jnp.where(m, n, o)

    return jax.tree_util.tree_map(sel, new, old)


def accept_update(state, q, new_log_prob, new_blobs, accepted):
    """Branch-free ensemble update: keep proposals where accepted.

    Equivalent of ``Move.update`` (reference ``move.py:12-45``) for the
    whole-ensemble (no subset) case.
    """
    coords = jnp.where(accepted[:, None], q, state.coords)
    log_prob = jnp.where(accepted, new_log_prob, state.log_prob)
    blobs = state.blobs
    if new_blobs is not None:
        blobs = tree_where(accepted, new_blobs, state.blobs)
    return state._replace(coords=coords, log_prob=log_prob, blobs=blobs)


class Move:
    """Base class; concrete moves implement :meth:`propose`."""

    #: Opt-in extended contract: when True, drivers call
    #: ``propose(..., tune=<bool>)`` so the move can skip adaptation-only
    #: work (e.g. ChEES gradient estimation) on production steps.
    wants_tune_flag = False

    def init_carry(self, nwalkers: int, ndim: int) -> Any:
        """Per-move scan-carried state (default: none)."""
        return ()

    def propose(self, key, state, model, carry) -> Tuple[Any, jax.Array, Any]:
        raise NotImplementedError

    def tune(self, carry, state, accepted, model=None) -> Any:
        """Adaptation hook; default no-op (reference ``move.py:9-10``).

        ``model`` supplies mesh-axis metadata so adaptive moves can reduce
        acceptance statistics over walker shards (shard-local means would
        silently diverge per shard under ``shard_map``).
        """
        return carry
