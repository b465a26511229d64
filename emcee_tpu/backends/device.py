"""Device-resident (HBM) chain backend.

The reference stores every chain on the host (``Backend`` keeps numpy
arrays, ``HDFBackend`` a file — ``/root/reference/src/emcee/backends/``).
On TPU the device→host link is often the slowest wire in the system (this
dev environment's tunnel sustains ~10–25 MB/s), so streaming the chain off
the chip can dominate a production run whose compute costs microseconds
per step.  :class:`DeviceBackend` keeps the chain in HBM instead:

* ``save_chunk`` appends the jitted scan chunk's *device* arrays without a
  transfer — the sampler detects ``wants_device_arrays`` and skips its
  ``jax.device_get``;
* reads (``get_chain``/``get_log_prob``/``get_blobs``/``accepted``)
  concatenate the chunks lazily on device and return JAX arrays; the host
  pays for exactly the slices it asks for (``np.asarray`` when a caller
  needs numpy);
* ``get_autocorr_time`` runs the batched FFT estimator on device — the
  chain never has to leave the chip for convergence monitoring.

Capacity is HBM-bounded: ``kept_steps × nwalkers × (ndim + 2)`` floats
(e.g. 1e5 walkers × 5 dims × 1000 kept rows ≈ 2.8 GB).  For longer runs,
thin, or drain to a host backend periodically (``to_host``).

Contract parity: implements the same surface as :class:`Backend`
(reference ``backends/backend.py:11-237``) — ``reset``/``grow``/
``save_step``/``save_chunk``/``get_value``/``get_last_sample``/
``shape``/``iteration``/``accepted``/``random_state``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..state import State
from .backend import (
    Backend,
    _check_blob_consistency,
    _key_data,
    _wrap_key,
    _pack_declared_blobs,
)

__all__ = ["DeviceBackend"]


class _DeviceChunkStore:
    """Shared machinery for HBM-resident chunk-list backends.

    Appended scan chunks are *consolidated in place* on first read: the
    chunk list is replaced by one concatenated copy, so HBM holds a
    single copy of the chain (not originals + a cached concat) and a
    read-after-append concatenates two operands, not the whole history.
    Used by :class:`DeviceBackend` and :class:`~.pt.PTDeviceBackend`.
    """

    def _init_store(self):
        self._chunks = []
        self._acc_cache = None

    # -- lazy RNG-key conversion -------------------------------------
    # save_chunk receives the post-chunk device key; converting it with
    # np.asarray there forces a host<->device sync per chunk (~25 ms per
    # roundtrip on a tunneled runtime — it was the single largest
    # per-call cost of the device-resident store path).  Keep the raw
    # key and convert on first read instead.

    @property
    def random_state(self):
        raw = getattr(self, "_rs_raw", None)
        if raw is None:
            return None
        if self._rs_np is None:
            self._rs_np = _key_data(raw)
        return self._rs_np

    @random_state.setter
    def random_state(self, value):
        self._rs_raw = value
        self._rs_np = None

    def _append_chunk(self, chunk):
        self._chunks.append(chunk)
        self._acc_cache = None

    def _consolidated(self):
        if len(self._chunks) > 1:
            self._chunks = [
                jax.tree_util.tree_map(
                    lambda *xs: jnp.concatenate(xs, axis=0), *self._chunks
                )
            ]
        return self._chunks[0] if self._chunks else None

    def _field(self, idx):
        c = self._consolidated()
        return None if c is None else c[idx]

    def _accepted_total(self):
        """Cumulative acceptance counts: base + on-device lazy sum over
        the stored per-step masks (field 3 of each chunk)."""
        if self._acc_cache is None:
            total = self._accepted_base
            acc = self._field(3)
            if acc is not None:
                total = total + np.asarray(
                    jnp.sum(
                        jnp.asarray(acc).astype(jnp.int32), axis=0
                    ),
                    dtype=np.int64,
                )
            self._acc_cache = total
        return self._acc_cache

    def _set_accepted_base(self, value):
        self._accepted_base = np.asarray(value, dtype=np.int64)
        self._acc_cache = None


class DeviceBackend(_DeviceChunkStore, Backend):
    """Store the chain in device memory (HBM) instead of host memory."""

    #: sampler hint: pass save_chunk the raw device arrays (no device_get)
    wants_device_arrays = True

    def reset(self, nwalkers, ndim):
        super().reset(nwalkers, ndim)
        # Per-chunk device arrays: (coords, log_prob, blobs, accepted).
        self._init_store()
        self._accepted_base = np.zeros(self.nwalkers, dtype=np.int64)

    # -- chain / log_prob / blobs are lazy views over the chunk store -----

    @property
    def chain(self):
        return self._field(0)

    @chain.setter
    def chain(self, value):
        if value is not None:
            raise AttributeError("DeviceBackend.chain is derived; not settable")

    @property
    def log_prob(self):
        return self._field(1)

    @log_prob.setter
    def log_prob(self, value):
        if value is not None:
            raise AttributeError(
                "DeviceBackend.log_prob is derived; not settable"
            )

    @property
    def blobs(self):
        if not self._chunks or self._chunks[0][2] is None:
            return None
        return self._field(2)

    @blobs.setter
    def blobs(self, value):
        if value is not None:
            raise AttributeError("DeviceBackend.blobs is derived; not settable")

    @property
    def accepted(self):
        """Cumulative per-walker acceptance counts (reference semantics).

        Summed on device, lazily — the per-step accept masks stay in HBM
        until someone asks.
        """
        return self._accepted_total()

    @accepted.setter
    def accepted(self, value):
        # reset() (and to_host round-trips) seed the cumulative base.
        self._set_accepted_base(value)

    # -- write path -------------------------------------------------------

    def grow(self, ngrow, blobs):
        """No-op: chunks append; capacity is bounded by HBM, not ngrow."""
        self._size = self.iteration + int(ngrow)

    def save_chunk(self, coords, log_prob, blobs, accepted, random_state):
        """Append one scan chunk of steps, keeping the arrays on device.

        Accepts device or host arrays; host arrays (e.g. the multi-host
        gather path) are kept as-is and promoted on first device read.
        """
        if self._chunks:
            # Structure is fixed by the first chunk: a mixed blob/no-blob
            # sequence would crash consolidation's tree_map later, or
            # worse return garbage (reference ``backend.py:158-162``).
            _check_blob_consistency(
                self.iteration, self._chunks[0][2] is not None, blobs
            )
        self._append_chunk((coords, log_prob, blobs, accepted))
        self.iteration += int(coords.shape[0])
        self.random_state = random_state  # raw device key; lazy read

    # -- reads ------------------------------------------------------------

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
                s[0] = int(np.prod(out.shape[:2]))
                return out.reshape(s)
            return out

        return jax.tree_util.tree_map(slice_leaf, v)

    def get_last_sample(self) -> State:
        if (not self.initialized) or self.iteration <= 0:
            raise AttributeError(
                "you must run the sampler with 'store == True' before "
                "accessing the results"
            )
        coords, log_prob, blobs, _ = self._chunks[-1]
        last_blobs = None
        if blobs is not None:
            last_blobs = jax.tree_util.tree_map(lambda b: b[-1], blobs)
            declared = getattr(self, "blobs_dtype", None)
            if declared is not None and np.dtype(declared).names:
                last_blobs = _pack_declared_blobs(
                    jax.tree_util.tree_map(
                        np.asarray, jax.device_get(last_blobs)
                    ),
                    declared,
                )
        return State(
            coords=coords[-1],
            log_prob=log_prob[-1],
            blobs=last_blobs,
            random_state=self.random_state,
        )

    # -- interop ----------------------------------------------------------

    def to_host(self, backend=None):
        """Drain the device-resident chain into a host backend.

        Args:
            backend: a host backend (default: a fresh :class:`Backend`).
                Must be empty or hold the prefix of this chain.

        Returns:
            The populated host backend.
        """
        if backend is None:
            backend = Backend()
        if not backend.initialized:
            backend.reset(self.nwalkers, self.ndim)
        start = backend.iteration
        if start > self.iteration:
            raise ValueError(
                "target backend is ahead of this DeviceBackend "
                f"({start} > {self.iteration})"
            )
        if start < self.iteration:
            sl = slice(start, self.iteration)
            blobs = None
            if self.has_blobs:
                blobs = jax.tree_util.tree_map(
                    lambda b: np.asarray(b[sl]), self.blobs
                )
            accepted = np.zeros((1, self.nwalkers), dtype=np.int64)
            accepted[0] = np.asarray(self.accepted) - np.asarray(
                backend.accepted
            )
            backend.save_chunk(
                np.asarray(self.chain[sl]),
                np.asarray(self.log_prob[sl]),
                blobs,
                accepted,
                _wrap_key(self.random_state),
            )
        return backend
