"""HDF5 chain backend, on-disk layout compatible with the reference.

The on-disk *schema* matches the reference
(``/root/reference/src/emcee/backends/hdf.py:105-144,203-241``) so chains
written here load through emcee's ``HDFBackend`` readers and analysis
tooling: a named group holding attrs ``version``, ``nwalkers``, ``ndim``,
``has_blobs``, ``iteration`` and resizable datasets ``accepted``, ``chain``,
``log_prob`` (plus ``blobs`` when present).  Execution-model differences:

* writes land per *chunk* (one file transaction per jitted scan chunk)
  rather than per step (the reference re-opens the file every iteration,
  ``hdf.py:243-267``);
* the RNG state attr is JAX PRNG key data (``jax_random_state``) instead of
  serialized MT19937 attrs — a reference reader sees no ``random_state``
  and continues, the same as for a pre-v3 file;
* blob pytrees are flattened into a single ``blobs`` dataset of shape
  ``(iteration, nwalkers)``: a lone array leaf keeps its plain dtype
  (reference single-blob layout) and multi-leaf pytrees become one
  structured (compound) dtype with one field per leaf — readable by the
  reference's ``get_blobs`` as a named record array.  Field names come
  from the sampler's ``blobs_dtype`` declaration when given, from dict
  keys for flat dict blobs, and default to ``blob{i}`` otherwise.  The
  original pytree kind (leaf / tuple / dict) is recorded in a
  ``blobs_kind`` attr so ``get_last_sample`` can rebuild the pytree for
  resume.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from ..state import State
from .backend import (
    Backend,
    _check_blob_consistency,
    _key_data,
    _wrap_key,
)

try:
    import h5py
except ImportError:
    h5py = None

__all__ = [
    "HDFBackend",
    "TempHDFBackend",
    "does_hdf5_support_longdouble",
]


def does_hdf5_support_longdouble():
    """Whether this platform's HDF5 round-trips ``np.longdouble``
    (reference ``backends/hdf.py:22-38``): some builds silently narrow
    float128/float80 to float64 on write, which the longdouble storage
    tests must xfail on."""
    if h5py is None:
        return False
    import tempfile

    fd, path = tempfile.mkstemp(suffix=".h5", prefix="emcee-tpu-ldprobe")
    os.close(fd)
    try:
        probe = np.arange(2, dtype=np.longdouble)
        with h5py.File(path, "w") as f:
            f.create_dataset("probe", data=probe)
        with h5py.File(path, "r") as f:
            back = f["probe"][...]
        return back.dtype == np.longdouble
    finally:
        os.remove(path)


def shard_filename(base, rank, count):
    """Per-process shard path for ``HDFBackend(shard_per_process=True)``."""
    return f"{base}.shard{int(rank):05d}-of-{int(count):05d}"


def merge_shards(filename, out=None, name="mcmc"):
    """Merge per-process shard files into one global reference-schema file.

    Args:
        filename: the base filename the sharded run was constructed
            with (shards live at ``<filename>.shardNNNNN-of-MMMMM``).
        out: output path (default: ``filename`` itself — the file a
            single-process run would have produced).
        name: run group name.

    Returns:
        An :class:`HDFBackend` opened read-only on the merged file.

    The merged file is bit-identical to what the same run would have
    written through the default gather-to-process-0 path: walker shards
    are placed back at their recorded offsets, per-walker ``accepted``
    counts concatenate, and the (process-replicated) PRNG key attr is
    taken from shard 0.
    """
    import glob as _glob

    if h5py is None:
        raise ImportError("you must install 'h5py' to merge shards")
    paths = sorted(_glob.glob(f"{filename}.shard*-of-*"))
    if not paths:
        raise FileNotFoundError(
            f"no shard files match {filename}.shard*-of-*"
        )
    out = out or filename

    shards = []
    for p in paths:
        with h5py.File(p, "r") as f:
            g = f[name]
            shards.append(
                dict(
                    path=p,
                    offset=int(g.attrs["walker_offset"]),
                    local=int(g.attrs["nwalkers"]),
                    global_nw=int(g.attrs["global_nwalkers"]),
                    ndim=int(g.attrs["ndim"]),
                    iteration=int(g.attrs["iteration"]),
                    has_blobs=bool(g.attrs["has_blobs"]),
                    attrs=dict(g.attrs),
                    chain=np.asarray(g["chain"][: g.attrs["iteration"]]),
                    log_prob=np.asarray(
                        g["log_prob"][: g.attrs["iteration"]]
                    ),
                    accepted=np.asarray(g["accepted"]),
                    blobs=np.asarray(g["blobs"][: g.attrs["iteration"]])
                    if g.attrs["has_blobs"]
                    else None,
                )
            )
    g_nw = shards[0]["global_nw"]
    it = shards[0]["iteration"]
    nd = shards[0]["ndim"]
    covered = sorted(
        (s["offset"], s["offset"] + s["local"]) for s in shards
    )
    expect = 0
    for lo, hi in covered:
        if lo != expect:
            raise ValueError(
                f"shard coverage gap/overlap at walker {expect} "
                f"(next shard starts at {lo})"
            )
        expect = hi
    if expect != g_nw:
        raise ValueError(
            f"shards cover {expect} walkers, global_nwalkers={g_nw}"
        )
    for s in shards[1:]:
        if s["iteration"] != it:
            raise ValueError(
                f"{s['path']} holds {s['iteration']} iterations, "
                f"{shards[0]['path']} holds {it}"
            )

    chain = np.empty((it, g_nw, nd), dtype=shards[0]["chain"].dtype)
    log_prob = np.empty((it, g_nw), dtype=shards[0]["log_prob"].dtype)
    accepted = np.empty(g_nw, dtype=shards[0]["accepted"].dtype)
    blobs = None
    if shards[0]["has_blobs"]:
        blobs = np.empty(
            (it, g_nw) + shards[0]["blobs"].shape[2:],
            dtype=shards[0]["blobs"].dtype,
        )
    for s in shards:
        sl = slice(s["offset"], s["offset"] + s["local"])
        chain[:, sl] = s["chain"]
        log_prob[:, sl] = s["log_prob"]
        accepted[sl] = s["accepted"]
        if blobs is not None:
            blobs[:, sl] = s["blobs"]

    with h5py.File(out, "a") as f:
        if name in f:
            del f[name]
        g = f.create_group(name)
        a0 = shards[0]["attrs"]
        g.attrs["version"] = a0.get("version", "tpu-0")
        g.attrs["nwalkers"] = g_nw
        g.attrs["ndim"] = nd
        g.attrs["has_blobs"] = blobs is not None
        g.attrs["iteration"] = it
        for key in ("blobs_kind", "blobs_fields", "jax_random_state"):
            if key in a0:
                g.attrs[key] = a0[key]
        g.create_dataset("accepted", data=accepted)
        g.create_dataset(
            "chain",
            data=chain,
            maxshape=(None, g_nw, nd),
        )
        g.create_dataset(
            "log_prob", data=log_prob, maxshape=(None, g_nw)
        )
        if blobs is not None:
            g.create_dataset(
                "blobs",
                data=blobs,
                maxshape=(None,) + blobs.shape[1:],
            )
    return HDFBackend(out, name, read_only=True)


def _flatten_blobs(blobs):
    """Flatten a blob pytree -> (leaves, kind, names).

    ``kind`` is one of ``"leaf"`` (single array), ``"tuple"`` (flat
    sequence), ``"dict"`` (flat string-keyed mapping) or ``"other"``
    (anything nested — stored flattened, restored as a tuple).
    """
    if isinstance(blobs, dict):
        names = sorted(blobs)
        vals = [blobs[k] for k in names]
        if all(not isinstance(v, (dict, tuple, list)) for v in vals):
            return [np.asarray(v) for v in vals], "dict", list(names)
    if isinstance(blobs, (tuple, list)):
        if all(not isinstance(v, (dict, tuple, list)) for v in blobs):
            return [np.asarray(v) for v in blobs], "tuple", None
    leaves = [np.asarray(x) for x in jax.tree_util.tree_leaves(blobs)]
    if len(leaves) == 1 and not isinstance(blobs, (dict, tuple, list)):
        return leaves, "leaf", None
    return leaves, "other", None


def _blob_record_dtype(leaves, names, declared=None):
    """Compound dtype with one field per leaf; leaf shape past the walker
    axis becomes the field's sub-shape (h5py stores it natively and the
    reference reader gets a normal numpy record array back).  Base dtypes
    follow the ``declared`` blobs_dtype when given, else the leaves."""
    fields = []
    for i, (name, leaf) in enumerate(zip(names, leaves)):
        base = leaf.dtype
        if declared is not None and declared.names is not None:
            base = declared[declared.names[i]].base
        fields.append((name, base, leaf.shape[1:]))
    return np.dtype(fields)


def _pack_records(leaves, names, lead_ndim):
    """Pack per-leaf arrays into one structured array over the leading
    ``lead_ndim`` axes (1 for a per-walker row, 2 for a chunk)."""
    lead = leaves[0].shape[:lead_ndim]
    dtype = np.dtype(
        [
            (name, leaf.dtype, leaf.shape[lead_ndim:])
            for name, leaf in zip(names, leaves)
        ]
    )
    out = np.empty(lead, dtype=dtype)
    for name, leaf in zip(names, leaves):
        out[name] = leaf
    return out


def _unpack_records(row, kind, names):
    """Rebuild the stored pytree kind from one structured record row."""
    if kind == "dict":
        return {n: np.asarray(row[n]) for n in names}
    return tuple(np.asarray(row[n]) for n in names)


def _check_blob_fields(stored_names, stored_kind, leaves, kind, names):
    """Reject a blob pytree that no longer matches the file's layout.

    Count alone is not enough: dict blobs with different keys would be
    silently written into the wrong fields (sorted-name order), so key
    sets must match exactly when both sides are dicts."""
    if len(stored_names) != len(leaves):
        raise ValueError(
            "blob structure changed: file stores "
            f"{len(stored_names)} fields, got {len(leaves)} leaves"
        )
    if ("dict" in (stored_kind, kind)) and stored_kind != kind:
        # A dict's leaves are ordered by sorted key, a tuple's by
        # position: crossing kinds writes leaves into the wrong fields
        # even when the count matches.
        raise ValueError(
            "blob structure changed: file stores kind "
            f"'{stored_kind}', got '{kind}'"
        )
    if kind == "dict" and stored_kind == "dict" and list(names) != list(
        stored_names
    ):
        raise ValueError(
            "blob field names changed: file stores "
            f"{list(stored_names)}, got {list(names)}"
        )


class HDFBackend(Backend):
    """A backend that stores the chain in an HDF5 file.

    Args:
        filename: path of the HDF5 file.
        name: group name holding this run (multiple named runs per file are
            supported, reference ``hdf.py:60``).
        read_only: refuse write access when True.
        compression / compression_opts: passed to dataset creation.
    """

    #: optional [(name, dtype), ...] declaration used to name blob fields
    #: on disk; the sampler forwards its ``blobs_dtype`` argument here.
    blobs_dtype = None

    def __init__(
        self,
        filename,
        name="mcmc",
        read_only=False,
        dtype=None,
        compression=None,
        compression_opts=None,
        shard_per_process=False,
    ):
        if h5py is None:
            raise ImportError("you must install 'h5py' to use the HDFBackend")
        self.filename = filename
        self.name = name
        self.read_only = read_only
        self.compression = compression
        self.compression_opts = compression_opts
        self.dtype_set = dtype is not None
        self.dtype = np.float64 if dtype is None else dtype
        # Pod-scale storage mode: every process writes only its OWN
        # walker shard to a per-process file, skipping the per-chunk
        # process_allgather (O(global chain) DCN traffic per chunk on
        # the default path — SURVEY §2.1 row 14).  Combine with
        # :func:`merge_shards` for the global reference-schema file.
        # Single-process runs ignore the flag (one file, full chain).
        self.shard_per_process = bool(shard_per_process)
        self.base_filename = filename
        if self.shard_per_process and jax.process_count() > 1:
            rank, n = jax.process_index(), jax.process_count()
            self.filename = shard_filename(filename, rank, n)

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
        if mode != "r" and self.read_only:
            raise RuntimeError(
                "The backend has been loaded in read-only "
                "mode. Set `read_only = False` to make "
                "changes."
            )
        f = h5py.File(self.filename, mode)
        # Adopt the on-file chain dtype the first time an existing run is
        # seen, so appends keep the stored precision.
        if not self.dtype_set:
            run = f.get(self.name)
            if run is not None and "chain" in run:
                self.dtype = run["chain"].dtype
                self.dtype_set = True
        return f

    def _dataset_opts(self):
        return dict(
            compression=self.compression,
            compression_opts=self.compression_opts,
        )

    def reset(self, nwalkers, ndim):
        """Drop any existing run group and lay out an empty one."""
        nw, nd = int(nwalkers), int(ndim)
        attrs = {
            "version": "tpu-0",
            "nwalkers": nw,
            "ndim": nd,
            "has_blobs": False,
            "iteration": 0,
        }
        growable = {"chain": (nw, nd), "log_prob": (nw,)}
        with self.open("a") as f:
            if self.name in f:
                del f[self.name]
            g = f.create_group(self.name)
            g.attrs.update(attrs)
            g.create_dataset(
                "accepted", data=np.zeros(nw), **self._dataset_opts()
            )
            for dsname, tail in growable.items():
                g.create_dataset(
                    dsname,
                    shape=(0,) + tail,
                    maxshape=(None,) + tail,
                    dtype=self.dtype,
                    **self._dataset_opts(),
                )

    def _read_attr(self, key):
        with self.open() as f:
            return f[self.name].attrs[key]

    @property
    def nwalkers(self):
        return int(self._read_attr("nwalkers"))

    @property
    def ndim(self):
        return int(self._read_attr("ndim"))

    @property
    def iteration(self):
        return int(self._read_attr("iteration"))

    @property
    def has_blobs(self):
        return bool(self._read_attr("has_blobs"))

    @property
    def accepted(self):
        with self.open() as f:
            return np.asarray(f[self.name]["accepted"])

    @property
    def random_state(self):
        with self.open() as f:
            data = f[self.name].attrs.get("jax_random_state")
            return None if data is None else np.asarray(data)

    @property
    def shape(self):
        # Shard files report the GLOBAL ensemble shape so the sampler's
        # resume-compatibility check holds; datasets are local-walker.
        with self.open() as f:
            g = f[self.name]
            nw = int(
                g.attrs.get("global_nwalkers", g.attrs["nwalkers"])
            )
            return (nw, int(g.attrs["ndim"]))

    def configure_shard(self, offset, local_nwalkers):
        """Re-lay the run group for this process's walker shard.

        Called by the sampler at the first sharded save: the group laid
        out by ``reset`` (global nwalkers) is replaced by a local-walker
        layout carrying ``walker_offset`` / ``global_nwalkers`` attrs
        for :func:`merge_shards`.  A no-op when already configured.
        """
        offset, local_nwalkers = int(offset), int(local_nwalkers)
        with self.open("a") as f:
            g = f[self.name]
            if "walker_offset" in g.attrs:
                if (
                    int(g.attrs["walker_offset"]) != offset
                    or int(g.attrs["nwalkers"]) != local_nwalkers
                ):
                    raise ValueError(
                        "shard layout changed: file holds walkers "
                        f"[{g.attrs['walker_offset']}:"
                        f"{g.attrs['walker_offset'] + g.attrs['nwalkers']}"
                        f"], save targets [{offset}:"
                        f"{offset + local_nwalkers}]"
                    )
                return
            if int(g.attrs["iteration"]) > 0:
                raise ValueError(
                    "cannot shard a file that already holds a "
                    "gathered chain"
                )
            global_nw = int(g.attrs["nwalkers"])
            ndim = int(g.attrs["ndim"])
        self.reset(local_nwalkers, ndim)
        with self.open("a") as f:
            g = f[self.name]
            g.attrs["walker_offset"] = offset
            g.attrs["global_nwalkers"] = global_nw
            g.attrs["shard_rank"] = jax.process_index()
            g.attrs["shard_count"] = jax.process_count()

    def _blob_field_names(self, leaves, kind, names):
        """Dataset field names: declared blobs_dtype first, then dict keys,
        then positional blob{i}."""
        if self.blobs_dtype is not None:
            declared = np.dtype(self.blobs_dtype).names
            if declared is not None and len(declared) == len(leaves):
                return list(declared)
        if names is not None:
            return names
        return [f"blob{i}" for i in range(len(leaves))]

    def grow(self, ngrow, blobs):
        """Extend capacity by ``ngrow`` steps; ``blobs`` is an example
        per-walker blob pytree (leaves shaped ``(nwalkers, ...)``) used to
        lay out blob storage the first time blobs appear."""
        with self.open("a") as f:
            g = f[self.name]
            _check_blob_consistency(
                int(g.attrs["iteration"]), g.attrs["has_blobs"], blobs
            )
            ntot = int(g.attrs["iteration"]) + int(ngrow)
            g["chain"].resize(ntot, axis=0)
            g["log_prob"].resize(ntot, axis=0)
            if blobs is None:
                return
            if g.attrs["has_blobs"]:
                g["blobs"].resize(ntot, axis=0)
                return
            leaves, kind, names = _flatten_blobs(blobs)
            names = self._blob_field_names(leaves, kind, names)
            nw = int(g.attrs["nwalkers"])
            if any(leaf.shape[0] != nw for leaf in leaves):
                raise ValueError(
                    "blob example passed to grow() must have leading "
                    f"nwalkers={nw} axis; got shapes "
                    f"{[leaf.shape for leaf in leaves]}"
                )
            declared = None
            if self.blobs_dtype is not None:
                d = np.dtype(self.blobs_dtype)
                if d.names is not None and len(d.names) == len(leaves):
                    declared = d
            if kind == "leaf":
                dt = np.dtype((leaves[0].dtype, leaves[0].shape[1:]))
            else:
                dt = _blob_record_dtype(leaves, names, declared)
            g.create_dataset(
                "blobs",
                shape=(ntot, nw),
                maxshape=(None, nw),
                dtype=dt,
                **self._dataset_opts(),
            )
            g.attrs["has_blobs"] = True
            g.attrs["blobs_kind"] = kind
            g.attrs["blobs_fields"] = names

    def _blobs_to_rows(self, g, blobs, k):
        """Chunk blob pytree -> (k, nwalkers) array matching the dataset."""
        leaves, kind, new_names = _flatten_blobs(blobs)
        stored_kind = g.attrs.get("blobs_kind", "leaf")
        if stored_kind == "leaf":
            return np.asarray(leaves[0])
        names = list(g.attrs["blobs_fields"])
        _check_blob_fields(names, stored_kind, leaves, kind, new_names)
        return _pack_records(leaves, names, lead_ndim=2)

    def save_chunk(self, coords, log_prob, blobs, accepted, random_state):
        coords = np.asarray(coords)
        k = coords.shape[0]
        # Capacity / blob-layout bookkeeping happens in its own
        # transaction (grow opens the file itself), so the write below
        # holds exactly one handle.
        with self.open() as f:
            g = f[self.name]
            it = int(g.attrs["iteration"])
            _check_blob_consistency(it, g.attrs["has_blobs"], blobs)
            short = it + k - g["chain"].shape[0]
            need_blob_init = blobs is not None and not g.attrs["has_blobs"]
        if short > 0 or need_blob_init:
            example = None
            if blobs is not None:
                example = jax.tree_util.tree_map(
                    lambda b: np.asarray(b)[0], blobs
                )
            self.grow(max(short, 0), example)
        with self.open("a") as f:
            g = f[self.name]
            g["chain"][it : it + k] = coords
            g["log_prob"][it : it + k] = np.asarray(log_prob)
            if blobs is not None:
                g["blobs"][it : it + k] = self._blobs_to_rows(g, blobs, k)
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
            v = g[name][discard + thin - 1 : iteration : thin]
            if flat:
                s = list(v.shape[1:])
                s[0] = np.prod(v.shape[:2])
                return v.reshape(s)
            return v

    def get_last_sample(self) -> State:
        if not self.initialized:
            # Also covers an existing-but-empty file (TempHDFBackend
            # creates the file up front): reading must raise the
            # reference's AttributeError, not h5py's OSError.
            raise AttributeError(
                "you must run the sampler with 'store == True' before "
                "accessing the results"
            )
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
                row = g["blobs"][it - 1]
                declared = getattr(self, "blobs_dtype", None)
                if (
                    declared is not None
                    and np.dtype(declared).names
                    and row.dtype.names is not None
                ):
                    # Declared named blobs: the reference carries the
                    # structured record array on the state.
                    blobs = np.asarray(row)
                else:
                    kind = g.attrs.get("blobs_kind", "leaf")
                    if kind == "leaf" or row.dtype.names is None:
                        blobs = np.asarray(row)
                    else:
                        blobs = _unpack_records(
                            row, kind, list(g.attrs["blobs_fields"])
                        )
            return State(
                coords=np.asarray(g["chain"][it - 1]),
                log_prob=np.asarray(g["log_prob"][it - 1]),
                blobs=blobs,
                random_state=self.random_state,
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
