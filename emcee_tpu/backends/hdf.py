"""HDF5 chain backend, on-disk layout compatible with the reference.

Schema matches ``/root/reference/src/emcee/backends/hdf.py:105-144,203-241``
so chains written here can be read by emcee's ``HDFBackend`` readers and
analysis tooling: a named group holding attrs ``version``, ``nwalkers``,
``ndim``, ``has_blobs``, ``iteration`` and resizable datasets ``accepted``,
``chain``, ``log_prob`` (and ``blobs`` when present).  Differences:

* writes land per *chunk* (one file-open + one resize per jitted scan chunk)
  rather than per step (``hdf.py:243-267`` re-opens the file every
  iteration);
* the RNG state attr is JAX PRNG key data (``jax_random_state``) instead of
  serialized MT19937 attrs — a reference reader simply sees no
  ``random_state`` and continues, same as for pre-existing files;
* pytree blobs with more than one leaf are stored under a ``blobs`` group
  with one dataset per leaf (a single-array blob stays a single ``blobs``
  dataset, matching the reference layout).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from ..state import State
from .backend import Backend, _key_data, _wrap_key

try:
    import h5py
except ImportError:
    h5py = None

__all__ = ["HDFBackend", "TempHDFBackend"]


class HDFBackend(Backend):
    """A backend that stores the chain in an HDF5 file.

    Args:
        filename: path of the HDF5 file.
        name: group name holding this run (multiple named runs per file are
            supported, reference ``hdf.py:60``).
        read_only: open the file read-only.
        compression / compression_opts: passed to dataset creation.
    """

    def __init__(
        self,
        filename,
        name="mcmc",
        read_only=False,
        dtype=None,
        compression=None,
        compression_opts=None,
    ):
        if h5py is None:
            raise ImportError("you must install 'h5py' to use the HDFBackend")
        self.filename = filename
        self.name = name
        self.read_only = read_only
        self.compression = compression
        self.compression_opts = compression_opts
        if dtype is None:
            self.dtype_set = False
            self.dtype = np.float64
        else:
            self.dtype_set = True
            self.dtype = dtype

    @property
    def initialized(self):
        if not os.path.exists(self.filename):
            return False
        try:
            with self.open() as f:
                return self.name in f
        except (OSError, IOError):
            return False

    def open(self, mode="r"):
        if self.read_only and mode != "r":
            raise RuntimeError(
                "The backend has been loaded in read-only "
                "mode. Set `read_only = False` to make "
                "changes."
            )
        f = h5py.File(self.filename, mode)
        if not self.dtype_set and self.name in f:
            g = f[self.name]
            if "chain" in g:
                self.dtype = g["chain"].dtype
                self.dtype_set = True
        return f

    def reset(self, nwalkers, ndim):
        with self.open("a") as f:
            if self.name in f:
                del f[self.name]
            g = f.create_group(self.name)
            g.attrs["version"] = "tpu-0"
            g.attrs["nwalkers"] = int(nwalkers)
            g.attrs["ndim"] = int(ndim)
            g.attrs["has_blobs"] = False
            g.attrs["iteration"] = 0
            g.create_dataset(
                "accepted",
                data=np.zeros(int(nwalkers)),
                compression=self.compression,
                compression_opts=self.compression_opts,
            )
            g.create_dataset(
                "chain",
                (0, int(nwalkers), int(ndim)),
                maxshape=(None, int(nwalkers), int(ndim)),
                dtype=self.dtype,
                compression=self.compression,
                compression_opts=self.compression_opts,
            )
            g.create_dataset(
                "log_prob",
                (0, int(nwalkers)),
                maxshape=(None, int(nwalkers)),
                dtype=self.dtype,
                compression=self.compression,
                compression_opts=self.compression_opts,
            )

    @property
    def nwalkers(self):
        with self.open() as f:
            return int(f[self.name].attrs["nwalkers"])

    @property
    def ndim(self):
        with self.open() as f:
            return int(f[self.name].attrs["ndim"])

    @property
    def iteration(self):
        with self.open() as f:
            return int(f[self.name].attrs["iteration"])

    @property
    def accepted(self):
        with self.open() as f:
            return np.asarray(f[self.name]["accepted"])

    @property
    def has_blobs(self):
        with self.open() as f:
            return bool(f[self.name].attrs["has_blobs"])

    @property
    def random_state(self):
        with self.open() as f:
            if "jax_random_state" in f[self.name].attrs:
                return np.asarray(f[self.name].attrs["jax_random_state"])
        return None

    @property
    def shape(self):
        return (self.nwalkers, self.ndim)

    def grow(self, ngrow, blobs):
        with self.open("a") as f:
            g = f[self.name]
            it = int(g.attrs["iteration"])
            ntot = it + int(ngrow)
            g["chain"].resize(ntot, axis=0)
            g["log_prob"].resize(ntot, axis=0)
            if blobs is not None:
                leaves, treedef = jax.tree_util.tree_flatten(
                    jax.tree_util.tree_map(np.asarray, blobs)
                )
                single = (
                    treedef.num_leaves == 1
                    and jax.tree_util.treedef_is_leaf(treedef)
                )
                if not g.attrs["has_blobs"]:
                    g.attrs["has_blobs"] = True
                    nw = int(g.attrs["nwalkers"])
                    if single:
                        b = leaves[0]
                        g.create_dataset(
                            "blobs",
                            (ntot, nw) + b.shape[1:],
                            maxshape=(None, nw) + b.shape[1:],
                            dtype=b.dtype,
                            compression=self.compression,
                            compression_opts=self.compression_opts,
                        )
                    else:
                        bg = g.create_group("blobs")
                        for i, b in enumerate(leaves):
                            bg.create_dataset(
                                f"leaf{i}",
                                (ntot, nw) + b.shape[1:],
                                maxshape=(None, nw) + b.shape[1:],
                                dtype=b.dtype,
                                compression=self.compression,
                                compression_opts=self.compression_opts,
                            )
                else:
                    if isinstance(g["blobs"], h5py.Dataset):
                        g["blobs"].resize(ntot, axis=0)
                    else:
                        for ds in g["blobs"].values():
                            ds.resize(ntot, axis=0)

    def save_chunk(self, coords, log_prob, blobs, accepted, random_state):
        coords = np.asarray(coords)
        k = coords.shape[0]
        with self.open("a") as f:
            g = f[self.name]
            it = int(g.attrs["iteration"])
            if it + k > g["chain"].shape[0]:
                f.close()
                self.grow(it + k - g["chain"].shape[0], blobs)
                f = self.open("a")
                g = f[self.name]
            g["chain"][it : it + k] = coords
            g["log_prob"][it : it + k] = np.asarray(log_prob)
            if blobs is not None:
                if not g.attrs["has_blobs"]:
                    raise ValueError(
                        "inconsistent use of blobs: call grow() with the "
                        "blob structure first"
                    )
                leaves = jax.tree_util.tree_leaves(blobs)
                if isinstance(g["blobs"], h5py.Dataset):
                    g["blobs"][it : it + k] = np.asarray(leaves[0])
                else:
                    for i, b in enumerate(leaves):
                        g["blobs"][f"leaf{i}"][it : it + k] = np.asarray(b)
            g["accepted"][...] = np.asarray(g["accepted"]) + np.asarray(
                accepted
            ).sum(axis=0)
            kd = _key_data(random_state)
            if kd is not None:
                g.attrs["jax_random_state"] = kd
            g.attrs["iteration"] = it + k

    def get_value(self, name, flat=False, thin=1, discard=0):
        if not self.initialized:
            raise AttributeError(
                "You must run the sampler with 'store == True' before "
                "accessing the results"
            )
        with self.open() as f:
            g = f[self.name]
            iteration = int(g.attrs["iteration"])
            if iteration <= 0:
                raise AttributeError(
                    "you must run the sampler with 'store == True' before "
                    "accessing the results"
                )
            if name == "blobs" and not g.attrs["has_blobs"]:
                return None

            def slice_ds(ds):
                v = ds[discard + thin - 1 : iteration : thin]
                if flat:
                    s = list(v.shape[1:])
                    s[0] = np.prod(v.shape[:2])
                    return v.reshape(s)
                return v

            if name == "blobs" and not isinstance(g["blobs"], h5py.Dataset):
                return tuple(
                    slice_ds(g["blobs"][f"leaf{i}"])
                    for i in range(len(g["blobs"]))
                )
            return slice_ds(g[name])

    def get_last_sample(self) -> State:
        it = self.iteration
        if it <= 0:
            raise AttributeError(
                "you must run the sampler with 'store == True' before "
                "accessing the results"
            )
        with self.open() as f:
            g = f[self.name]
            blobs = None
            if g.attrs["has_blobs"]:
                if isinstance(g["blobs"], h5py.Dataset):
                    blobs = np.asarray(g["blobs"][it - 1])
                else:
                    blobs = tuple(
                        np.asarray(g["blobs"][f"leaf{i}"][it - 1])
                        for i in range(len(g["blobs"]))
                    )
            return State(
                coords=np.asarray(g["chain"][it - 1]),
                log_prob=np.asarray(g["log_prob"][it - 1]),
                blobs=blobs,
                random_state=_wrap_key(self.random_state),
            )


class TempHDFBackend:
    """Context manager creating a disposable HDF backend (for tests)."""

    def __init__(self, dtype=None, compression=None, compression_opts=None):
        self.dtype = dtype
        self.filename = None
        self.compression = compression
        self.compression_opts = compression_opts

    def __enter__(self):
        import tempfile

        f = tempfile.NamedTemporaryFile(
            prefix="emcee-temporary-hdf5", suffix=".hdf5", delete=False
        )
        f.close()
        self.filename = f.name
        return HDFBackend(
            f.name,
            "test",
            dtype=self.dtype,
            compression=self.compression,
            compression_opts=self.compression_opts,
        )

    def __exit__(self, exception_type, exception_value, traceback):
        os.remove(self.filename)
