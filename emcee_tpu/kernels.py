"""Functional kernel API.

A pure-function facade over the move machinery for users who want to
embed the ensemble step in their own ``jax.lax.scan`` / ``shard_map``
pipelines instead of driving the :class:`EnsembleSampler` object — the
TPU-idiomatic composition style (cf. blackjax kernels).

Example::

    import jax, jax.numpy as jnp
    from emcee_tpu.kernels import build_kernel

    init, step = build_kernel(log_prob, nwalkers=1024)
    state, carry = init(coords, jax.random.key(0))

    def body(sc, _):
        state, accepted, carry = step(*sc)
        return (state, carry), state.coords

    (state, carry), chain = jax.lax.scan(
        body, (state, carry), None, length=1000
    )
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from . import moves as _moves_mod
from .model import Model, wrap_log_prob_fn
from .state import State

__all__ = ["build_kernel"]


def build_kernel(
    log_prob_fn: Callable,
    nwalkers: int,
    move=None,
    *,
    vectorize: bool = False,
    args=None,
    kwargs=None,
    tune: bool = False,
    axis_name: Optional[str] = None,
    param_axis: Optional[str] = None,
    ndim: Optional[int] = None,
) -> Tuple[Callable, Callable]:
    """Build ``(init_fn, step_fn)`` for one ensemble move.

    Args:
        log_prob_fn: as for :class:`EnsembleSampler`.
        nwalkers: global walker count (for the red-blue guard).
        move: a single move instance (default ``StretchMove()``).
        tune: apply the move's adaptation hook every step.
        axis_name / param_axis: mesh axis names when the returned step is
            called inside ``shard_map`` (walker sharding / long-ndim
            partial-sum mode).
        ndim: global dimensionality (required with ``param_axis``).

    Returns:
        ``init_fn(coords, key) -> (State, carry)`` evaluating initial
        log-probs and building the move's carry, and
        ``step_fn(state, carry) -> (State, accepted, carry)`` advancing one
        proposal.  The carry holds the move's mutable state (tuned scales,
        ``sequential`` dim counters) and must be threaded through the scan
        — dropping it freezes stateful moves.  Both functions are
        jit/scan/shard_map-compatible and pure.
    """
    if move is None:
        move = _moves_mod.StretchMove()
    compute = wrap_log_prob_fn(
        log_prob_fn, args=args, kwargs=kwargs, vectorize=vectorize
    )
    model = Model(
        compute_log_prob=compute,
        axis_name=axis_name,
        nwalkers=int(nwalkers),
        param_axis=param_axis,
        ndim=ndim,
    )
    def init_fn(coords, key):
        coords = jnp.asarray(coords)
        lp, blobs = compute(coords)
        state = State(
            coords=coords,
            log_prob=lp,
            blobs=blobs,
            random_state=key,
        )
        # Carry shapes may depend on the dimensionality (DIME's moment
        # matrices, DEZ's archive), so build the carry where coords
        # supply ndim when the caller didn't pass it.
        carry0 = move.init_carry(
            int(nwalkers),
            ndim if ndim is not None else int(coords.shape[-1]),
        )
        return state, carry0

    def step_fn(state: State, carry):
        key, k_prop = jax.random.split(state.random_state)
        state = state._replace(random_state=key)
        if getattr(move, "wants_tune_flag", False):
            new_state, accepted, carry = move.propose(
                k_prop, state, model, carry, tune=tune
            )
        else:
            new_state, accepted, carry = move.propose(
                k_prop, state, model, carry
            )
        if tune:
            carry = move.tune(carry, new_state, accepted, model)
        return new_state, accepted, carry

    return init_fn, step_fn
