"""Ensemble state pytree.

The analogue of the reference's ``State`` container
(``/root/reference/src/emcee/state.py:10``) redesigned as an immutable JAX
pytree so it can be carried through ``jax.lax.scan``, donated across jitted
steps, and sharded over a device mesh.  Differences from the reference:

* ``random_state`` is a JAX typed PRNG key (threefry), not a NumPy
  ``RandomState`` tuple.  Keys are split functionally each step.
* ``blobs`` is an arbitrary JAX pytree whose leaves have a leading
  ``nwalkers`` axis (the reference stores an object/structured numpy array,
  ``ensemble.py:498-547``; dynamic dtype inference is impossible under jit, so
  blob structure is fixed by the first log-prob evaluation).
* Immutable: updates go through ``_replace`` (the class is a NamedTuple).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["State"]


class State(NamedTuple):
    """A snapshot of the walker ensemble.

    Fields
    ------
    coords:
        ``(nwalkers, ndim)`` walker positions.
    log_prob:
        ``(nwalkers,)`` log-probabilities, or ``None`` before the first
        evaluation.
    random_state:
        JAX PRNG key advancing the chain, or ``None``.
    blobs:
        Optional pytree of per-walker metadata with leading axis
        ``nwalkers``.
    """

    coords: jax.Array
    log_prob: Optional[jax.Array] = None
    random_state: Optional[jax.Array] = None
    blobs: Optional[Any] = None

    @property
    def nwalkers(self) -> int:
        return self.coords.shape[0]

    @property
    def ndim(self) -> int:
        return self.coords.shape[1]

    def __repr__(self):
        return (
            "State(coords={0!r}, log_prob={1!r}, blobs={2!r}, "
            "random_state={3!r})".format(
                getattr(self.coords, "shape", self.coords),
                getattr(self.log_prob, "shape", self.log_prob),
                jax.tree_util.tree_structure(self.blobs)
                if self.blobs is not None
                else None,
                "<key>" if self.random_state is not None else None,
            )
        )


def as_state(initial_state, dtype=None) -> State:
    """Coerce user input (array, tuple, or State) into a ``State``.

    Mirrors the copy-constructor behavior of the reference
    (``state.py:35-46``): a bare ``(nwalkers, ndim)`` array becomes a state
    with no log-prob; an existing ``State`` passes through.
    """
    if isinstance(initial_state, State):
        if dtype is not None and initial_state.coords.dtype != dtype:
            initial_state = initial_state._replace(
                coords=jnp.asarray(initial_state.coords, dtype=dtype)
            )
        return initial_state
    if isinstance(initial_state, (tuple, list)) and not isinstance(
        initial_state, np.ndarray
    ):
        # Back-compat tuple forms: (coords,), (coords, log_prob), ...
        return State(*initial_state)
    coords = jnp.asarray(initial_state, dtype=dtype)
    return State(coords=coords)


def walkers_independent(coords) -> bool:
    """Condition-number check on the initial ensemble.

    Same contract as the reference (``ensemble.py:653-663``): the centered,
    column-scaled walker matrix must have a condition number below 1e8,
    otherwise the ensemble spans a degenerate subspace and affine-invariant
    moves cannot explore.  Runs on host with float64 for the same dynamic
    range as the reference implementation.
    """
    C = np.asarray(jax.device_get(coords), dtype=np.float64)
    if not np.all(np.isfinite(C)):
        return False
    C = C - np.mean(C, axis=0)[None, :]
    C_colmax = np.amax(np.abs(C), axis=0)
    if np.any(C_colmax == 0):
        return False
    C = C / C_colmax
    C_colsum = np.sqrt(np.sum(C**2, axis=0))
    C = C / C_colsum
    return np.linalg.cond(C.astype(float)) <= 1e8
