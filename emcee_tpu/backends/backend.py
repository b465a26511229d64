"""In-memory chain backend.

Same storage contract as the reference ``Backend``
(``/root/reference/src/emcee/backends/backend.py:11-237``): chain
``(iteration, nwalkers, ndim)``, log-prob ``(iteration, nwalkers)``,
cumulative per-walker ``accepted`` counts, optional blobs, and the sampler
RNG state.  Two TPU-driven changes:

* the primary write path is :meth:`save_chunk` — the sampler lands a whole
  jitted scan chunk of steps in one host transfer instead of one
  ``save_step`` per iteration (``backend.py:214-231``); ``save_step``
  remains for single-step compatibility;
* ``random_state`` is JAX PRNG key data (uint32 words), not a MT19937
  tuple.

Blobs are stored as a pytree of numpy arrays with leading
``(iteration, nwalkers)`` axes; dynamic dtype inference (object/ragged
blobs) is out of scope under jit.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np

from ..ops import autocorr
from ..state import State

__all__ = ["Backend"]


def _key_data(random_state):
    if random_state is None:
        return None
    try:
        return np.asarray(jax.random.key_data(random_state))
    except TypeError:
        return np.asarray(random_state)


def _check_blob_consistency(iteration, has_blobs, blobs):
    """A store's blob structure is fixed by its first save: a blob-ful
    chain continued by a blob-less model (or vice versa) must error, not
    silently leave uninitialized rows (reference ``backend.py:158-162``).

    The blob-ful-store + blob-less-save direction errors at *any*
    iteration (matching the reference): ``grow(n, blob_template)`` on a
    fresh store flips ``has_blobs`` before the first save, and letting a
    blob-less save through at iteration 0 would leave uninitialized blob
    rows behind.  The opposite direction (blobs appearing) is only an
    error once rows exist, so it keeps the ``iteration > 0`` gate.
    """
    if bool(has_blobs) and blobs is None:
        raise ValueError("inconsistent use of blobs")
    if iteration > 0 and blobs is not None and not bool(has_blobs):
        raise ValueError("inconsistent use of blobs")



def _pack_declared_blobs(blobs, declared):
    """Pack per-walker blob leaves into a structured row array when the
    sampler declared a named ``blobs_dtype`` (reference ``State.blobs``
    carries the structured array in that case, and the reference test
    helper iterates ``last.blobs.dtype.names``)."""
    if blobs is None or declared is None:
        return blobs
    declared = np.dtype(declared)
    if declared.names is None:
        return blobs
    leaves = [np.asarray(x) for x in jax.tree_util.tree_leaves(blobs)]
    if len(leaves) != len(declared.names):
        return blobs
    dtype = np.dtype(
        [
            (name, declared[name].base, leaf.shape[1:])
            for name, leaf in zip(declared.names, leaves)
        ]
    )
    out = np.empty(leaves[0].shape[0], dtype=dtype)
    for name, leaf in zip(declared.names, leaves):
        out[name] = leaf
    return out


def _wrap_key(data):
    if data is None:
        return None
    return jax.random.wrap_key_data(np.asarray(data, dtype=np.uint32))


class Backend:
    """A simple default backend that stores the chain in host memory."""

    def __init__(self, dtype=None):
        self.initialized = False
        self.dtype = dtype

    # Context-manager protocol (reference ``backend.py:233-237``): the
    # reference's tests and user code do ``with backend() as be:``.
    def __enter__(self):
        return self

    def __exit__(self, exception_type, exception_value, traceback):
        pass

    def reset(self, nwalkers, ndim):
        """Clear the state of the chain and empty the backend."""
        self.nwalkers = int(nwalkers)
        self.ndim = int(ndim)
        self.iteration = 0
        self.accepted = np.zeros(self.nwalkers, dtype=np.int64)
        self.chain = None
        self.log_prob = None
        self.blobs = None
        self.random_state = None
        self.initialized = True
        self._size = 0

    @property
    def shape(self):
        return (self.nwalkers, self.ndim)

    @property
    def has_blobs(self):
        return self.blobs is not None

    def grow(self, ngrow, blobs):
        """Pre-allocate space for ``ngrow`` more steps.

        Args:
            ngrow: number of steps to grow by.
            blobs: an example blob pytree (leading axis nwalkers) or None,
                used to allocate blob storage on first growth.
        """
        # The consistency precondition must run here too (reference
        # grow() checks first thing): run_mcmc pre-grows before any
        # save, and a template that flips has_blobs would let the
        # save_chunk check pass over an uninitialized blob prefix.
        _check_blob_consistency(self.iteration, self.has_blobs, blobs)
        ngrow = int(ngrow)
        self._size = self.iteration + ngrow
        dtype = self.dtype or np.float64

        def grown(arr, shape, dt):
            new = np.empty((self._size,) + shape, dtype=dt)
            if arr is not None:
                new[: self.iteration] = arr[: self.iteration]
            return new

        if self.chain is not None:
            dtype = self.chain.dtype
        self.chain = grown(self.chain, (self.nwalkers, self.ndim), dtype)
        self.log_prob = grown(self.log_prob, (self.nwalkers,), dtype)
        if blobs is not None:
            example = jax.tree_util.tree_map(np.asarray, blobs)
            if self.blobs is None:
                self.blobs = jax.tree_util.tree_map(
                    lambda b: np.empty(
                        (self._size,) + b.shape, dtype=b.dtype
                    ),
                    example,
                )
            else:
                self.blobs = jax.tree_util.tree_map(
                    lambda old, b: grown(old, b.shape, b.dtype),
                    self.blobs,
                    example,
                )

    def _ensure_capacity(self, n, blobs=None):
        if self.chain is None or self.iteration + n > self._size:
            example = None
            if blobs is not None:
                # grow() expects a per-walker example (nwalkers, ...);
                # blobs arrive chunk-shaped (k, nwalkers, ...).
                example = jax.tree_util.tree_map(
                    lambda b: np.asarray(b)[0], blobs
                )
            self.grow(max(n, 1), example)

    def save_chunk(self, coords, log_prob, blobs, accepted, random_state):
        """Append a chunk of steps fetched from device.

        Args:
            coords: ``(k, nwalkers, ndim)``
            log_prob: ``(k, nwalkers)``
            blobs: pytree of ``(k, nwalkers, ...)`` arrays or None
            accepted: ``(k, nwalkers)`` bool — per-step accepted vectors
            random_state: the post-chunk PRNG key
        """
        coords = np.asarray(coords)
        k = coords.shape[0]
        _check_blob_consistency(self.iteration, self.has_blobs, blobs)
        self._ensure_capacity(k, blobs)
        i = self.iteration
        self.chain[i : i + k] = coords
        self.log_prob[i : i + k] = np.asarray(log_prob)
        if blobs is not None:
            if self.blobs is None:
                # grow() was not told about blobs; allocate now.
                example = jax.tree_util.tree_map(
                    lambda b: np.asarray(b)[0], blobs
                )
                size = self._size
                self.blobs = jax.tree_util.tree_map(
                    lambda b: np.empty((size,) + b.shape, dtype=b.dtype),
                    example,
                )
            jax.tree_util.tree_map(
                lambda store, b: store.__setitem__(
                    slice(i, i + k), np.asarray(b)
                ),
                self.blobs,
                blobs,
            )
        self.accepted += np.asarray(accepted).sum(axis=0)
        self.iteration += k
        self.random_state = _key_data(random_state)

    def save_step(self, state, accepted):
        """Single-step compatibility wrapper (reference ``save_step``)."""
        blobs = None
        if state.blobs is not None:
            blobs = jax.tree_util.tree_map(
                lambda b: np.asarray(b)[None], state.blobs
            )
        self.save_chunk(
            np.asarray(state.coords)[None],
            np.asarray(state.log_prob)[None],
            blobs,
            np.asarray(accepted)[None],
            state.random_state,
        )

    def get_value(self, name, flat=False, thin=1, discard=0):
        if self.iteration <= 0:
            raise AttributeError(
                "you must run the sampler with 'store == True' before "
                "accessing the results"
            )
        if name == "blobs" and not self.has_blobs:
            return None
        if name == "chain":
            v = self.chain
        elif name == "log_prob":
            v = self.log_prob
        elif name == "blobs":
            v = self.blobs
        else:
            raise ValueError(f"unrecognized value name: {name}")

        def slice_leaf(leaf):
            out = leaf[discard + thin - 1 : self.iteration : thin]
            if flat:
                s = list(out.shape[1:])
                s[0] = np.prod(out.shape[:2])
                return out.reshape(s)
            return out

        return jax.tree_util.tree_map(slice_leaf, v)

    def get_chain(self, **kwargs):
        return self.get_value("chain", **kwargs)

    def get_log_prob(self, **kwargs):
        return self.get_value("log_prob", **kwargs)

    def get_blobs(self, **kwargs):
        return self.get_value("blobs", **kwargs)

    def get_last_sample(self) -> State:
        """The most recent chain sample as a :class:`State`."""
        if (not self.initialized) or self.iteration <= 0:
            raise AttributeError(
                "you must run the sampler with 'store == True' before "
                "accessing the results"
            )
        it = self.iteration
        blobs = None
        if self.has_blobs:
            blobs = jax.tree_util.tree_map(lambda b: b[it - 1], self.blobs)
            blobs = _pack_declared_blobs(
                blobs, getattr(self, "blobs_dtype", None)
            )
        return State(
            coords=self.chain[it - 1],
            log_prob=self.log_prob[it - 1],
            blobs=blobs,
            random_state=self.random_state,
        )

    def get_autocorr_time(self, discard=0, thin=1, **kwargs):
        x = self.get_chain(discard=discard, thin=thin)
        return thin * autocorr.integrated_time(x, **kwargs)
