"""Metropolis-Hastings move (non-ensemble).

Matches the reference (``/root/reference/src/emcee/moves/mh.py:11-65``): a
full-ensemble proposal from a user function followed by the vectorized
accept ``log U < new_lp - lp + factors``.  No complement is needed, so under
sharding this is embarrassingly parallel — no collectives at all.

Proposal-function contract is JAX-style:
``proposal_function(key, coords, carry) -> (q, factors, carry)`` or the
simpler ``(key, coords) -> (q, factors)``; ``carry`` lets stateful proposals
(e.g. ``GaussianMove``'s ``sequential`` dim counter) thread their state
through the scan.
"""

from __future__ import annotations

import inspect

import jax
import jax.numpy as jnp

from .base import Move, accept_update

__all__ = ["MHMove"]


class MHMove(Move):
    """General Metropolis-Hastings move.

    Args:
        proposal_function: ``(key, coords[, carry])`` -> proposal; see module
            docstring.
        ndim: optional dimensionality this proposal is valid for
            (reference ``mh.py:47-49``).
    """

    def __init__(self, proposal_function, ndim=None):
        self.ndim = ndim
        self.get_proposal = proposal_function
        try:
            nparams = len(
                inspect.signature(proposal_function).parameters
            )
        except (TypeError, ValueError):
            nparams = 2
        self._carries = nparams >= 3

    # Subclasses coupling dimensions (full-cov Gaussian, random/sequential
    # dim selection) set this False; checked under parameter sharding.
    _param_shard_ok = True

    def propose(self, key, state, model, carry):
        nwalkers, ndim = state.coords.shape
        if self.ndim is not None and model.param_axis is None and (
            self.ndim != ndim
        ):
            raise ValueError("Dimension mismatch in proposal")
        if model.param_axis is not None and not self._param_shard_ok:
            raise NotImplementedError(
                "this proposal couples parameter dimensions and does not "
                "support parameter-axis sharding"
            )

        key_prop, key_acc = jax.random.split(key)
        # Proposal noise differs per parameter shard (each holds different
        # dims); accept uniforms must be identical across parameter shards.
        key_prop = model.fold_param(model.fold_walker(key_prop))
        key_acc = model.fold_walker(key_acc)

        if self._carries:
            q, factors, carry = self.get_proposal(
                key_prop, state.coords, carry
            )
        else:
            q, factors = self.get_proposal(key_prop, state.coords)

        new_log_prob, new_blobs = model.compute_log_prob(q)
        lnpdiff = new_log_prob - state.log_prob + factors
        accepted = jnp.log(
            jax.random.uniform(key_acc, (nwalkers,), dtype=lnpdiff.dtype)
        ) < lnpdiff

        new_state = accept_update(state, q, new_log_prob, new_blobs, accepted)
        return new_state, accepted, carry
