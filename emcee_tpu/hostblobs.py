"""Host-side object-blob storage for host-callback likelihoods.

The reference supports fully dynamic blobs — object dtypes, strings,
ragged tuples — because everything runs on the host and blobs are plain
Python values selected per walker by the accept mask
(``/root/reference/src/emcee/ensemble.py:498-547``).  Under jit, blob
values must be device arrays with static structure, which rules those
out — EXCEPT on the host-callback path, where every evaluation already
crosses to Python.

The design here keeps the *device* side fully static: each host
evaluation stores its raw per-walker blob entries (the ``l[1:]`` tuples
of the reference protocol) in a host-side table and returns an ``int32``
handle per walker.  Handles are ordinary array data, so acceptance
selection, thinning, chunked scans, interrupts and storage all work
unchanged — the chain simply records which evaluation each walker's
current blob came from.  At save / read time the handles resolve back
through the table into arrays with the reference's exact dtype
semantics (dtype inference, object fallback for ragged/string blobs,
size-1-axis squeeze).
"""

from __future__ import annotations

import numpy as np

__all__ = ["HostBlobStore", "OBJECT_BLOBS"]

#: ``callback_blobs`` sentinel selecting host-side object-blob storage.
OBJECT_BLOBS = "__object__"


class HostBlobStore:
    """Table of per-walker blob entries keyed by int32 handles."""

    def __init__(self):
        self._table = {}
        self._next = 0

    def __len__(self):
        return len(self._table)

    def alloc(self, entries):
        """Store one evaluation's per-walker entries; return handles."""
        n = len(entries)
        if self._next + n > np.iinfo(np.int32).max:
            raise RuntimeError(
                "host blob store exhausted the int32 handle space "
                "(~2.1e9 evaluations); object-blob runs of this length "
                "are not supported"
            )
        ids = np.arange(self._next, self._next + n, dtype=np.int32)
        for i, e in zip(ids, entries):
            self._table[int(i)] = e
        self._next += n
        return ids

    def has_all(self, ids):
        return all(int(i) in self._table for i in np.asarray(ids).ravel())

    def _resolve_step(self, step_ids, declared_dtype):
        """One step's walker entries -> array, reference semantics
        (``ensemble.py:514-546``): dtype from the first entry, object
        fallback for ragged/string data, squeeze size-1 axes beyond the
        walker axis."""
        rows = [self._table[int(i)] for i in step_ids]
        if declared_dtype is not None:
            dt = np.dtype(declared_dtype)
        else:
            try:
                dt = np.atleast_1d(rows[0]).dtype
            except (ValueError, TypeError):
                dt = np.dtype("object")
            if dt.kind in "US":
                # Strings must be objects or they silently truncate to
                # the first entry's length.
                dt = np.dtype("object")
        try:
            arr = _array_rows(rows, dt)
        except ValueError:
            # Ragged rows (e.g. per-walker tuples mixing a scalar and a
            # vector): the reference lands these in an object array.
            arr = _array_rows(rows, np.dtype("object"))
        shape = arr.shape[1:]
        if len(shape):
            axes = tuple(
                i + 1 for i, s in enumerate(shape) if s == 1
            )
            if axes:
                arr = arr.squeeze(axis=axes)
        return arr

    def resolve(self, ids, declared_dtype=None):
        """Resolve handle arrays into blob arrays.

        ``ids`` may be ``(nwalkers,)`` (one step) or
        ``(nsteps, nwalkers)`` (a chunk); the result carries the same
        leading axes.  Raises ``ValueError`` when steps disagree on
        blob shape/dtype — the reference's "inconsistent use of blobs"
        condition for shape-shifting blob functions."""
        ids = np.asarray(ids)
        if ids.ndim == 1:
            return self._resolve_step(ids, declared_dtype)
        steps = [self._resolve_step(row, declared_dtype) for row in ids]
        first = steps[0]
        for s in steps[1:]:
            if s.shape != first.shape or s.dtype != first.dtype:
                raise ValueError(
                    "inconsistent use of blobs: blob shape/dtype "
                    f"changed mid-run ({first.dtype}{first.shape} vs "
                    f"{s.dtype}{s.shape})"
                )
        out = np.empty((len(steps),) + first.shape, dtype=first.dtype)
        for i, s in enumerate(steps):
            out[i] = s
        return out

    def prune(self, keep_ids, below):
        """Drop entries with id < ``below`` except those in
        ``keep_ids`` (the live ensemble's handles).  Entries >= below
        belong to chunks not yet resolved and always survive."""
        keep = {int(i) for i in np.asarray(keep_ids).ravel()}
        below = int(below)
        for i in [
            i for i in self._table if i < below and i not in keep
        ]:
            del self._table[i]


def _array_rows(rows, dt):
    """``np.array(rows, dtype=dt)`` — the reference's exact packing
    (``ensemble.py:538``): numpy recurses into uniformly-nested
    sequences (so a per-walker ``(("a", "b"),)`` entry becomes an
    ``(nw, 1, 2)`` object array, squeezed later) and stops at the first
    ragged level (mixed-shape tuples become one object per cell).  The
    manual fill only covers object rows numpy cannot assemble."""
    if dt == np.dtype("object"):
        try:
            return np.array(rows, dtype=object)
        except ValueError:
            width = len(rows[0]) if isinstance(rows[0], tuple) else 1
            arr = np.empty((len(rows), width), dtype=object)
            for i, r in enumerate(rows):
                entry = r if isinstance(r, tuple) else (r,)
                if len(entry) != width:
                    raise ValueError("ragged blob rows")
                for j, v in enumerate(entry):
                    arr[i, j] = v
            return arr
    return np.array(rows, dtype=dt)
