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

    Field (= positional-constructor) order matches the reference
    (``state.py:30-45``): ``State(coords, log_prob, blobs,
    random_state)``.  Iteration follows the reference's *legacy unpack*
    order instead (``state.py:47-75``): ``coords, log_prob,
    random_state`` for a blob-less state (the tutorial 3-tuple idiom),
    with ``blobs`` appended when present.

    Fields
    ------
    coords:
        ``(nwalkers, ndim)`` walker positions.
    log_prob:
        ``(nwalkers,)`` log-probabilities, or ``None`` before the first
        evaluation.
    blobs:
        Optional pytree of per-walker metadata with leading axis
        ``nwalkers``.
    random_state:
        JAX PRNG key advancing the chain, or ``None``.
    """

    coords: jax.Array
    log_prob: Optional[jax.Array] = None
    blobs: Optional[Any] = None
    random_state: Optional[jax.Array] = None

    # Legacy unpack parity (reference ``state.py:47-75``).  JAX pytree
    # flattening and the namedtuple field accessors use C-level tuple
    # storage (field order) and are unaffected; ``_replace``/``_make``/
    # ``_asdict`` are re-attached below with iteration-free
    # implementations (the stdlib versions iterate ``self`` and would
    # see the logical order/length).
    def __iter__(self):
        c, lp, blobs, rs = tuple.__getitem__(self, slice(0, 4))
        if blobs is None:
            return iter((c, lp, rs))
        return iter((c, lp, rs, blobs))

    def __len__(self) -> int:
        return 3 if tuple.__getitem__(self, 2) is None else 4

    def __getitem__(self, index):
        # Reference ``State.__getitem__``: logical order (coords,
        # log_prob, random_state[, blobs]); negative indices wrap by the
        # logical length, and index 3 is only valid with blobs.
        logical = tuple(iter(self))
        if isinstance(index, slice):
            return logical[index]
        if index < 0:
            index = len(logical) + index
        if 0 <= index < len(logical):
            return logical[index]
        raise IndexError("Invalid index '{0}'".format(index))

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


# typing.NamedTuple forbids overriding these in the class body; attach
# iteration-free versions (the stdlib ones build from ``iter(self)`` /
# ``len(result)``, which the legacy unpack above redefines).
def _state_new(
    cls, coords, log_prob=None, blobs=None, random_state=None, copy=False
):
    # Reference copy-constructor form: ``State(other_state[, copy=True])``
    # (``state.py:35-41``).  JAX pytree unflattening calls
    # ``State(*children)`` in field order, which this signature preserves.
    if hasattr(coords, "coords"):
        from copy import deepcopy

        dc = deepcopy if copy else (lambda x: x)
        return tuple.__new__(
            cls,
            (
                dc(coords.coords),
                dc(getattr(coords, "log_prob", None)),
                dc(getattr(coords, "blobs", None)),
                dc(getattr(coords, "random_state", None)),
            ),
        )
    return tuple.__new__(cls, (coords, log_prob, blobs, random_state))


def _state_replace(self, **kwds):
    fields = {
        name: tuple.__getitem__(self, i)
        for i, name in enumerate(State._fields)
    }
    for name in kwds:
        if name not in fields:
            raise ValueError(f"Got unexpected field names: {[name]!r}")
    fields.update(kwds)
    return State(**fields)


def _state_make(cls, iterable):
    # Field order (coords, log_prob, blobs, random_state), padded with
    # None defaults.
    values = tuple(iterable)
    if not 1 <= len(values) <= 4:
        raise TypeError(f"Expected 1-4 arguments, got {len(values)}")
    return tuple.__new__(cls, values + (None,) * (4 - len(values)))


def _state_asdict(self):
    return {
        name: tuple.__getitem__(self, i)
        for i, name in enumerate(State._fields)
    }


State.__new__ = _state_new
State._replace = _state_replace
State._make = classmethod(_state_make)
State._asdict = _state_asdict
# Pickle via the raw field-order tuple (positional ctor order matches).
State.__getnewargs__ = lambda self: tuple(
    tuple.__getitem__(self, slice(0, 4))
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
        # Back-compat tuple forms in the v2 sampler-output / legacy
        # unpack order: (coords,), (coords, log_prob),
        # (coords, log_prob, random_state[, blobs]).
        names = ("coords", "log_prob", "random_state", "blobs")
        if len(initial_state) > 4:
            raise ValueError(
                "cannot coerce a tuple of length "
                f"{len(initial_state)} into a State"
            )
        return State(**dict(zip(names, initial_state)))
    arr = np.asarray(initial_state)
    if arr.dtype == np.longdouble and dtype is None:
        # No XLA extended-precision type; keep the numpy array (callers
        # downcast to float64 at device put — reference issue #312's
        # "longdouble doesn't crash" contract).
        return State(coords=arr)
    coords = jnp.asarray(initial_state, dtype=dtype)
    return State(coords=coords)


def coerce_random_state(rs):
    """Coerce a ``State.random_state`` value to a typed JAX PRNG key.

    Returns the key, or ``None`` when the value carries no usable JAX
    key: backends hand chain consumers *raw key data* (an indexable
    uint32 word array — reference code does ``state.random_state[1:]``
    on its MT19937 tuples, which a 0-d typed key would break), and
    reference users may feed an actual ``np.random`` state tuple, which
    has no JAX equivalent (the RNG-stream divergence is documented in
    docs/migrating.md) — callers fall back to their own key stream.
    """
    if rs is None:
        return None
    if isinstance(rs, jax.Array) and jnp.issubdtype(
        rs.dtype, jax.dtypes.prng_key
    ):
        return rs
    if isinstance(rs, tuple) and rs and isinstance(rs[0], str):
        return None  # numpy RandomState tuple — not convertible
    try:
        arr = np.asarray(rs)
    except Exception:
        return None
    if arr.dtype == np.uint32 and arr.ndim == 1 and arr.size in (2, 4):
        return jax.random.wrap_key_data(arr)
    return None


def walkers_independent(coords) -> bool:
    """Condition-number check on the initial ensemble.

    Same contract as the reference (``ensemble.py:653-663``): the centered,
    column-scaled walker matrix must have a condition number below 1e8,
    otherwise the ensemble spans a degenerate subspace and affine-invariant
    moves cannot explore.  Runs on host with float64 for the same dynamic
    range as the reference implementation.
    """
    if (
        isinstance(coords, jax.Array)
        and not coords.is_fully_addressable
    ):
        # Resumed multi-process state: the global ensemble spans other
        # hosts' devices; gather it (the check needs the full matrix).
        from jax.experimental import multihost_utils

        coords = multihost_utils.process_allgather(coords, tiled=True)
    C = np.asarray(jax.device_get(coords))
    # Keep extended precision when the caller supplies it (the reference
    # resolves np.longdouble offsets beyond float64's 2^53; integration
    # test ``test_walkers_independent_randn_offset_longdouble``); widen
    # everything else to float64 for the centering arithmetic.
    if C.dtype != np.longdouble:
        C = C.astype(np.float64)
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
