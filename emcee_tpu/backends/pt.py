"""Backends for parallel-tempered chains.

The reference has no tempered storage (PTSampler was removed in v3);
these extend the chain-store contract to the ``(ntemps, nwalkers)`` ladder:
chain ``(it, T, nw, nd)``, per-rung ``log_like``/``log_prior``, cumulative
``accepted (T, nw)``, pair-swap counters, and the PRNG key — giving
tempered runs the same crash-resume story as :class:`..backends.Backend`.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from ..state import State  # noqa: F401  (re-export convenience)
from .backend import _check_blob_consistency, _key_data, _wrap_key
from .device import _DeviceChunkStore
from .hdf import (
    _check_blob_fields,
    _flatten_blobs,
    _pack_records,
    _unpack_records,
)

try:
    import h5py
except ImportError:
    h5py = None

__all__ = ["PTBackend", "PTDeviceBackend", "PTHDFBackend"]


class PTBackend:
    """In-memory store for parallel-tempered chains."""

    def __init__(self, dtype=None):
        self.initialized = False
        self.dtype = dtype or np.float64

    def reset(self, ntemps, nwalkers, ndim):
        self.ntemps = int(ntemps)
        self.nwalkers = int(nwalkers)
        self.ndim = int(ndim)
        self.iteration = 0
        self._size = 0
        self.chain = None
        self.log_like = None
        self.log_prior = None
        self.blobs = None
        self.accepted = np.zeros((self.ntemps, self.nwalkers), np.int64)
        self.swaps_accepted = np.zeros(max(self.ntemps - 1, 1), np.int64)
        self.swaps_proposed = np.zeros(max(self.ntemps - 1, 1), np.int64)
        self.random_state = None
        self.betas = None
        self.initialized = True

    @property
    def shape(self):
        return (self.ntemps, self.nwalkers, self.ndim)

    @property
    def has_blobs(self):
        return self.blobs is not None

    def grow(self, ngrow, blobs=None):
        # Same precondition as the flat Backend.grow: a pre-grow that
        # flips has_blobs would defeat save_chunk's consistency check.
        _check_blob_consistency(self.iteration, self.has_blobs, blobs)
        new_size = self.iteration + int(ngrow)
        if self.chain is not None and new_size <= self._size:
            # Already pre-sized (run_mcmc pre-grows by nsteps) — but a
            # first-time blob template must still allocate, or the next
            # save_chunk tree_maps over blobs=None and crashes.
            if blobs is not None and self.blobs is None:
                example = jax.tree_util.tree_map(np.asarray, blobs)
                self.blobs = jax.tree_util.tree_map(
                    lambda b: np.empty(
                        (self._size,) + b.shape, dtype=b.dtype
                    ),
                    example,
                )
            return
        self._size = new_size

        def grown(arr, shape, dt):
            new = np.empty((self._size,) + shape, dtype=dt)
            if arr is not None:
                new[: self.iteration] = arr[: self.iteration]
            return new

        T, nw, nd = self.ntemps, self.nwalkers, self.ndim
        self.chain = grown(self.chain, (T, nw, nd), self.dtype)
        self.log_like = grown(self.log_like, (T, nw), self.dtype)
        self.log_prior = grown(self.log_prior, (T, nw), self.dtype)
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
                    lambda old, b: grown(old, b.shape, old.dtype),
                    self.blobs,
                    example,
                )
        elif self.blobs is not None:
            self.blobs = jax.tree_util.tree_map(
                lambda old: grown(old, old.shape[1:], old.dtype),
                self.blobs,
            )

    def save_chunk(
        self,
        coords,
        log_like,
        log_prior,
        accepted,
        swaps_accepted,
        swaps_proposed,
        random_state,
        betas,
        blobs=None,
    ):
        coords = np.asarray(coords)
        k = coords.shape[0]
        _check_blob_consistency(self.iteration, self.has_blobs, blobs)
        if self.chain is None or self.iteration + k > self._size:
            # Un-pre-grown fallback: grow geometrically so repeated
            # appends amortize to O(n) total copying, not O(chunks * n).
            template = None
            if blobs is not None:
                template = jax.tree_util.tree_map(
                    lambda b: np.asarray(b)[0], blobs
                )
            self.grow(max(k, self.iteration), template)
        i = self.iteration
        self.chain[i : i + k] = coords
        self.log_like[i : i + k] = np.asarray(log_like)
        self.log_prior[i : i + k] = np.asarray(log_prior)
        if blobs is not None:
            jax.tree_util.tree_map(
                lambda dst, src: dst.__setitem__(
                    slice(i, i + k), np.asarray(src)
                ),
                self.blobs,
                blobs,
            )
        self.accepted += np.asarray(accepted).sum(axis=0)
        self.swaps_accepted = np.asarray(swaps_accepted)
        self.swaps_proposed = np.asarray(swaps_proposed)
        self.iteration += k
        self.random_state = _key_data(random_state)
        self.betas = np.asarray(betas)

    def _get(self, name, discard=0, thin=1):
        if self.iteration <= 0:
            raise AttributeError(
                "you must run the sampler with 'store == True' before "
                "accessing the results"
            )
        v = getattr(self, name)[discard + thin - 1 : self.iteration : thin]
        return v

    def get_chain(self, discard=0, thin=1, flat=False, temp=None):
        v = self._get("chain", discard, thin)
        if temp is not None:
            v = v[:, temp]
            if flat:
                return v.reshape(-1, v.shape[-1])
        return v

    def get_log_like(self, discard=0, thin=1):
        return self._get("log_like", discard, thin)

    def get_log_prior(self, discard=0, thin=1):
        return self._get("log_prior", discard, thin)

    def get_blobs(self, discard=0, thin=1, temp=None):
        if not self.has_blobs:
            return None
        if self.iteration <= 0:
            raise AttributeError(
                "you must run the sampler with 'store == True' before "
                "accessing the results"
            )

        def sl(leaf):
            v = leaf[discard + thin - 1 : self.iteration : thin]
            return v[:, temp] if temp is not None else v

        return jax.tree_util.tree_map(sl, self.blobs)

    def _last_blobs(self):
        if not self.has_blobs:
            return None
        it = self.iteration
        return jax.tree_util.tree_map(lambda b: b[it - 1], self.blobs)

    def get_last_sample(self):
        from ..parallel.tempering import PTState

        it = self.iteration
        if it <= 0:
            raise AttributeError("empty backend")
        return PTState(
            coords=self.chain[it - 1],
            log_like=self.log_like[it - 1],
            log_prior=self.log_prior[it - 1],
            random_state=self.random_state,
            blobs=self._last_blobs(),
        )


class PTDeviceBackend(_DeviceChunkStore, PTBackend):
    """Device-resident (HBM) store for parallel-tempered chains.

    Tempered analogue of :class:`..backends.DeviceBackend` (shares its
    chunk-store machinery): the sampler hands over the chunk's device
    arrays without a host transfer (``wants_device_arrays``); only the
    tiny swap counters cross to the host.  Reads consolidate lazily on
    device and return JAX arrays; ``to_host()`` drains into any host PT
    backend.
    """

    wants_device_arrays = True

    def reset(self, ntemps, nwalkers, ndim):
        super().reset(ntemps, nwalkers, ndim)
        # Per-chunk device arrays: (coords, log_like, log_prior, accepted).
        self._init_store()
        self._accepted_base = np.zeros(
            (self.ntemps, self.nwalkers), np.int64
        )

    @property
    def chain(self):
        return self._field(0)

    @chain.setter
    def chain(self, value):
        if value is not None:
            raise AttributeError(
                "PTDeviceBackend.chain is derived; not settable"
            )

    @property
    def log_like(self):
        return self._field(1)

    @log_like.setter
    def log_like(self, value):
        if value is not None:
            raise AttributeError(
                "PTDeviceBackend.log_like is derived; not settable"
            )

    @property
    def log_prior(self):
        return self._field(2)

    @log_prior.setter
    def log_prior(self, value):
        if value is not None:
            raise AttributeError(
                "PTDeviceBackend.log_prior is derived; not settable"
            )

    @property
    def blobs(self):
        if not self._chunks or self._chunks[0][4] is None:
            return None
        return self._field(4)

    @blobs.setter
    def blobs(self, value):
        if value is not None:
            raise AttributeError(
                "PTDeviceBackend.blobs is derived; not settable"
            )

    @property
    def accepted(self):
        return self._accepted_total()

    @accepted.setter
    def accepted(self, value):
        self._set_accepted_base(value)

    def grow(self, ngrow, blobs=None):
        self._size = self.iteration + int(ngrow)

    def save_chunk(
        self,
        coords,
        log_like,
        log_prior,
        accepted,
        swaps_accepted,
        swaps_proposed,
        random_state,
        betas,
        blobs=None,
    ):
        if self._chunks:
            # Mixed blob/no-blob chunks would crash consolidation later
            # (reference ``backend.py:158-162`` raises the same way).
            _check_blob_consistency(
                self.iteration, self._chunks[0][4] is not None, blobs
            )
        self._append_chunk(
            (coords, log_like, log_prior, accepted, blobs)
        )
        self.iteration += int(coords.shape[0])
        # The swap counters and ladder arrive as host numpy (the run
        # loop fetches them for its own bookkeeping); only random_state
        # may be a raw device key — _DeviceChunkStore's property
        # converts it on first read instead of paying a host<->device
        # sync (~25 ms on a tunneled runtime) every chunk.
        self.swaps_accepted = swaps_accepted
        self.swaps_proposed = swaps_proposed
        self.random_state = random_state
        self.betas = betas

    def get_last_sample(self):
        from ..parallel.tempering import PTState

        if self.iteration <= 0:
            raise AttributeError("empty backend")
        coords, ll, lpr, _, blobs = self._chunks[-1]
        last_blobs = None
        if blobs is not None:
            last_blobs = jax.tree_util.tree_map(lambda b: b[-1], blobs)
        return PTState(
            coords=coords[-1],
            log_like=ll[-1],
            log_prior=lpr[-1],
            random_state=self.random_state,
            blobs=last_blobs,
        )

    def to_host(self, backend=None):
        """Drain the device-resident tempered chain into a host backend.

        Incremental: only rows past the target's iteration move.
        """
        if backend is None:
            backend = PTBackend()
        if not backend.initialized:
            backend.reset(self.ntemps, self.nwalkers, self.ndim)
        start = backend.iteration
        if start > self.iteration:
            raise ValueError(
                "target backend is ahead of this PTDeviceBackend "
                f"({start} > {self.iteration})"
            )
        if start < self.iteration:
            sl = slice(start, self.iteration)
            accepted = np.zeros(
                (1, self.ntemps, self.nwalkers), dtype=np.int64
            )
            accepted[0] = np.asarray(self.accepted) - np.asarray(
                backend.accepted
            )
            blobs = None
            if self.blobs is not None:
                blobs = jax.tree_util.tree_map(
                    lambda b: np.asarray(b[sl]), self.blobs
                )
            backend.save_chunk(
                np.asarray(self.chain[sl]),
                np.asarray(self.log_like[sl]),
                np.asarray(self.log_prior[sl]),
                accepted,
                self.swaps_accepted,
                self.swaps_proposed,
                _wrap_key(self.random_state),
                self.betas,
                blobs=blobs,
            )
        return backend


class PTHDFBackend(PTBackend):
    """HDF5 store for parallel-tempered chains.

    Layout extends the emcee group schema with a temperature axis:
    attrs ``ntemps/nwalkers/ndim/iteration``, datasets ``chain
    (it, T, nw, nd)``, ``log_like``, ``log_prior``, ``accepted (T, nw)``,
    ``swaps_accepted/proposed (T-1,)``, ``betas (T,)``.
    """

    def __init__(self, filename, name="ptmcmc", read_only=False, dtype=None):
        if h5py is None:
            raise ImportError("you must install 'h5py' to use PTHDFBackend")
        self.filename = filename
        self.name = name
        self.read_only = read_only
        self.dtype = dtype or np.float64

    @property
    def initialized(self):
        if not os.path.exists(self.filename):
            return False
        try:
            with h5py.File(self.filename, "r") as f:
                return self.name in f
        except (OSError, IOError):
            return False

    def open(self, mode="r"):
        if self.read_only and mode != "r":
            raise RuntimeError("backend loaded in read-only mode")
        return h5py.File(self.filename, mode)

    def reset(self, ntemps, nwalkers, ndim):
        T, nw, nd = int(ntemps), int(nwalkers), int(ndim)
        with self.open("a") as f:
            if self.name in f:
                del f[self.name]
            g = f.create_group(self.name)
            g.attrs["version"] = "tpu-0"
            g.attrs["ntemps"] = T
            g.attrs["nwalkers"] = nw
            g.attrs["ndim"] = nd
            g.attrs["iteration"] = 0
            g.create_dataset("accepted", data=np.zeros((T, nw)))
            g.create_dataset(
                "swaps_accepted", data=np.zeros(max(T - 1, 1))
            )
            g.create_dataset(
                "swaps_proposed", data=np.zeros(max(T - 1, 1))
            )
            g.attrs["has_blobs"] = False
            g.create_dataset("betas", data=np.zeros(T))
            for nm, shape in [
                ("chain", (T, nw, nd)),
                ("log_like", (T, nw)),
                ("log_prior", (T, nw)),
            ]:
                g.create_dataset(
                    nm,
                    (0,) + shape,
                    maxshape=(None,) + shape,
                    dtype=self.dtype,
                )

    def _ensure_blob_dataset(self, g, blobs_template):
        """Create the structured blobs dataset from a per-step template
        (leaves with leading ``(T, nw)`` axes) on first sight."""
        if "blobs" in g:
            return
        leaves, kind, names = _flatten_blobs(blobs_template)
        if names is None:
            names = [f"blob{i}" for i in range(len(leaves))]
        dtype = np.dtype(
            [
                (name, leaf.dtype, leaf.shape[2:])
                for name, leaf in zip(names, leaves)
            ]
        )
        T, nw = leaves[0].shape[:2]
        g.create_dataset(
            "blobs", (0, T, nw), maxshape=(None, T, nw), dtype=dtype
        )
        g.attrs["has_blobs"] = True
        g.attrs["blobs_kind"] = kind
        g.attrs["blobs_fields"] = names

    def grow(self, ngrow, blobs=None):
        """Pre-size the datasets (h5py resize; no data copying)."""
        with self.open("a") as f:
            g = f[self.name]
            _check_blob_consistency(
                int(g.attrs["iteration"]),
                g.attrs.get("has_blobs", False),
                blobs,
            )
            if blobs is not None:
                self._ensure_blob_dataset(g, blobs)
            size = int(g.attrs["iteration"]) + int(ngrow)
            names = ("chain", "log_like", "log_prior") + (
                ("blobs",) if "blobs" in g else ()
            )
            for nm in names:
                if size > g[nm].shape[0]:
                    g[nm].resize(size, axis=0)

    def _attr(self, name):
        with self.open() as f:
            return f[self.name].attrs[name]

    @property
    def ntemps(self):
        return int(self._attr("ntemps"))

    @property
    def nwalkers(self):
        return int(self._attr("nwalkers"))

    @property
    def ndim(self):
        return int(self._attr("ndim"))

    @property
    def iteration(self):
        return int(self._attr("iteration"))

    @property
    def accepted(self):
        with self.open() as f:
            return np.asarray(f[self.name]["accepted"])

    @property
    def swaps_accepted(self):
        with self.open() as f:
            return np.asarray(f[self.name]["swaps_accepted"])

    @property
    def swaps_proposed(self):
        with self.open() as f:
            return np.asarray(f[self.name]["swaps_proposed"])

    @property
    def betas(self):
        with self.open() as f:
            return np.asarray(f[self.name]["betas"])

    @property
    def random_state(self):
        with self.open() as f:
            if "jax_random_state" in f[self.name].attrs:
                return np.asarray(f[self.name].attrs["jax_random_state"])
        return None

    @property
    def shape(self):
        return (self.ntemps, self.nwalkers, self.ndim)

    def save_chunk(
        self,
        coords,
        log_like,
        log_prior,
        accepted,
        swaps_accepted,
        swaps_proposed,
        random_state,
        betas,
        blobs=None,
    ):
        coords = np.asarray(coords)
        k = coords.shape[0]
        with self.open("a") as f:
            g = f[self.name]
            it = int(g.attrs["iteration"])
            _check_blob_consistency(
                it, g.attrs.get("has_blobs", False), blobs
            )
            writes = [
                ("chain", coords),
                ("log_like", np.asarray(log_like)),
                ("log_prior", np.asarray(log_prior)),
            ]
            if blobs is not None:
                if "blobs" not in g:
                    self._ensure_blob_dataset(
                        g,
                        jax.tree_util.tree_map(
                            lambda b: np.asarray(b)[0], blobs
                        ),
                    )
                leaves, kind, new_names = _flatten_blobs(blobs)
                names = list(g.attrs["blobs_fields"])
                _check_blob_fields(
                    names,
                    g.attrs.get("blobs_kind", "leaf"),
                    leaves,
                    kind,
                    new_names,
                )
                writes.append(
                    ("blobs", _pack_records(leaves, names, lead_ndim=3))
                )
            for nm, val in writes:
                ds = g[nm]
                if it + k > ds.shape[0]:
                    ds.resize(it + k, axis=0)
                ds[it : it + k] = val
            g["accepted"][...] = np.asarray(g["accepted"]) + np.asarray(
                accepted
            ).sum(axis=0)
            g["swaps_accepted"][...] = np.asarray(swaps_accepted)
            g["swaps_proposed"][...] = np.asarray(swaps_proposed)
            g["betas"][...] = np.asarray(betas)
            kd = _key_data(random_state)
            if kd is not None:
                g.attrs["jax_random_state"] = kd
            g.attrs["iteration"] = it + k

    @property
    def has_blobs(self):
        with self.open() as f:
            return bool(f[self.name].attrs.get("has_blobs", False))

    def _get(self, name, discard=0, thin=1):
        with self.open() as f:
            g = f[self.name]
            it = int(g.attrs["iteration"])
            if it <= 0:
                raise AttributeError(
                    "you must run the sampler with 'store == True' "
                    "before accessing the results"
                )
            return np.asarray(g[name][discard + thin - 1 : it : thin])

    def get_blobs(self, discard=0, thin=1, temp=None, structured=False):
        """Stored blobs with leading ``(it, T, nw)`` axes (one rung's
        with ``temp``).

        Returns the same pytree shape the in-memory PT backends return
        (a bare array for single-leaf blobs, the original tuple/dict
        for multi-leaf ones), rebuilt from the on-disk structured
        record array.  Pass ``structured=True`` for the raw on-disk
        record array instead (the flat :class:`HDFBackend`'s
        reference-schema behavior)."""
        with self.open() as f:
            g = f[self.name]
            if not g.attrs.get("has_blobs", False):
                return None
            it = int(g.attrs["iteration"])
            if it <= 0:
                raise AttributeError(
                    "you must run the sampler with 'store == True' "
                    "before accessing the results"
                )
            v = np.asarray(g["blobs"][discard + thin - 1 : it : thin])
            kind = g.attrs.get("blobs_kind", "leaf")
            names = list(g.attrs["blobs_fields"])
        if structured:
            return v[:, temp] if temp is not None else v
        if kind == "leaf" or v.dtype.names is None:
            out = np.asarray(v[names[0]]) if v.dtype.names else v
            return out[:, temp] if temp is not None else out
        blobs = _unpack_records(v, kind, names)
        if temp is not None:
            blobs = jax.tree_util.tree_map(lambda b: b[:, temp], blobs)
        return blobs

    def get_last_sample(self):
        from ..parallel.tempering import PTState

        with self.open() as f:
            g = f[self.name]
            it = int(g.attrs["iteration"])
            if it <= 0:
                raise AttributeError("empty backend")
            blobs = None
            if g.attrs.get("has_blobs", False):
                row = g["blobs"][it - 1]  # structured (T, nw)
                kind = g.attrs.get("blobs_kind", "leaf")
                names = list(g.attrs["blobs_fields"])
                if kind == "leaf":
                    blobs = np.asarray(row[names[0]])
                else:
                    blobs = _unpack_records(row, kind, names)
            return PTState(
                coords=np.asarray(g["chain"][it - 1]),
                log_like=np.asarray(g["log_like"][it - 1]),
                log_prior=np.asarray(g["log_prior"][it - 1]),
                random_state=self.random_state,
                blobs=blobs,
            )
