"""Shared driver plumbing for the flat and tempered samplers.

:class:`~.sampler.EnsembleSampler` and
:class:`~.parallel.tempering.PTSampler` present the same constructor
surface for move schedules, reduced-precision storage, and chunk
scheduling (the reference keeps the analogous parsing inline in one
driver, ``/root/reference/src/emcee/ensemble.py:115-129``, because it
only has one); the shared pieces live here so the two drivers cannot
drift.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

__all__ = [
    "parse_moves",
    "parse_io_dtype",
    "chunk_schedule",
    "BlobStruct",
    "blobs_struct_of",
    "cast_io",
    "grow_blobs_template",
    "kick_async_fetch",
    "shim_thin",
]


def shim_thin(n, thin):
    """Map the deprecated ``thin=`` argument (counts *proposals*,
    reference ``ensemble.py:355-372``; the v1.2 ``PTSampler.sample``
    used the same convention) onto ``(kept, thin_by)``.

    When ``n`` is not divisible by ``thin`` this runs
    ``(n // thin) * thin`` proposals — the reference would advance the
    tail proposals too without storing them; the warning says so.
    """
    import warnings

    warnings.warn(
        "the 'thin' argument is deprecated; use 'thin_by' (which "
        "counts kept steps, not proposals) instead; note n not "
        "divisible by thin rounds down to (n // thin) * thin "
        "proposals, and generators yield once per KEPT step (the "
        "reference yielded every proposal under thin=)",
        DeprecationWarning,
        stacklevel=3,  # shim_thin -> sampler method -> user call site
    )
    thin = int(thin)
    if thin <= 0:
        raise ValueError("Invalid thinning argument")
    return (None if n is None else int(n) // thin), thin


def cast_io(x, io_dtype):
    """Cast a stored float array to the reduced ``io_dtype`` (traced;
    non-float leaves and ``io_dtype=None`` pass through)."""
    if io_dtype is None or not jnp.issubdtype(x.dtype, jnp.floating):
        return x
    return x.astype(io_dtype)


def grow_blobs_template(blobs, io_dtype):
    """Host-side shape/dtype template for ``backend.grow``.

    ``grow`` only reads ``.shape``/``.dtype`` of the example leaves;
    building numpy empties (with the ``io_dtype`` cast applied to float
    leaves) avoids issuing eager device casts/transfers at run start —
    each eager op is a full remote compile on the tunneled TPU runtime.
    """
    import jax

    if blobs is None:
        return None

    def t(leaf):
        dt = leaf.dtype
        if io_dtype is not None and jnp.issubdtype(dt, jnp.floating):
            dt = io_dtype
        return np.empty(leaf.shape, dtype=dt)

    return jax.tree_util.tree_map(t, blobs)


def kick_async_fetch(outs):
    """Start the device->host DMA for a chunk's stored outputs now, so
    the transfer overlaps host bookkeeping / the next chunk's compute
    instead of starting only when ``device_get`` blocks on it.  The
    ``EMCEE_TPU_SYNC_FETCH`` env toggle exists for A/B measurement only.
    """
    import jax

    if os.environ.get("EMCEE_TPU_SYNC_FETCH"):
        return
    jax.tree_util.tree_map(
        lambda a: a.copy_to_host_async()
        if hasattr(a, "copy_to_host_async")
        else None,
        outs,
    )


class BlobStruct:
    """Hashable token describing a blob pytree (for the jit cache) that
    also carries an example tree for building PartitionSpec trees."""

    def __init__(self, treedef, shapes, example):
        self.treedef = treedef
        self.shapes = shapes
        self.example = example

    def __hash__(self):
        return hash((self.treedef, self.shapes))

    def __eq__(self, other):
        return (
            isinstance(other, BlobStruct)
            and self.treedef == other.treedef
            and self.shapes == other.shapes
        )


def blobs_struct_of(blobs):
    """Hashable structural token of a blob pytree (None passes)."""
    import jax

    if blobs is None:
        return None
    leaves, treedef = jax.tree_util.tree_flatten(blobs)
    shapes = tuple(
        (tuple(leaf.shape), jnp.asarray(leaf).dtype.name)
        for leaf in leaves
    )
    return BlobStruct(treedef, shapes, blobs)


def parse_moves(moves, default_move_factory):
    """Parse a move schedule into ``(moves, normalized_weights)``.

    Accepts a single move, a list of moves, or a weighted
    ``[(move, weight), ...]`` list (reference ``ensemble.py:115-129``).
    """
    if moves is None:
        return [default_move_factory()], np.array([1.0])
    if hasattr(moves, "propose"):
        return [moves], np.array([1.0])
    moves = list(moves)
    if all(hasattr(m, "__len__") and len(m) == 2 for m in moves):
        parsed, w = map(list, zip(*moves))
        weights = np.asarray(w, dtype=float)
    else:
        parsed = moves
        weights = np.ones(len(moves))
    if np.any(weights < 0):
        raise ValueError("Move weights must be non-negative")
    if np.sum(weights) == 0:
        raise ValueError("At least one move must have a positive weight")
    return parsed, weights / np.sum(weights)


def parse_io_dtype(io_dtype):
    """Validate the reduced-precision storage dtype (None passes)."""
    if io_dtype is None:
        return None
    dt = jnp.dtype(io_dtype)
    if not jnp.issubdtype(dt, jnp.floating):
        raise ValueError("io_dtype must be a floating dtype")
    return dt


def _schedule_sizes(nsteps, max_chunk):
    """Split ``nsteps`` into chunk sizes, minimizing distinct scan
    lengths: a ragged final chunk costs a second XLA compile, so prefer
    an equal divisor of ``nsteps`` when one exists reasonably close to
    the memory-derived ``max_chunk``."""
    if nsteps <= max_chunk:
        return [nsteps]
    for d in range(max_chunk, max(1, max_chunk // 2), -1):
        if nsteps % d == 0:
            return [d] * (nsteps // d)
    sizes = [max_chunk] * (nsteps // max_chunk)
    if nsteps % max_chunk:
        sizes.append(nsteps % max_chunk)
    return sizes


def chunk_schedule(nsteps, max_chunk, mixture_block=1):
    """Chunk sizes for ``nsteps`` kept steps.

    With an active ``mixture_block`` (> 1), chunk sizes are kept
    multiples of the block so the blocked execution path engages (a
    non-multiple chunk silently falls back to per-proposal move
    selection); at most one ragged tail chunk takes the fallback.  When
    the io budget allows fewer kept steps than one block, chunks still
    hold one whole block (the storage buffer bound becomes
    ``mixture_block`` steps).
    """
    blk = int(mixture_block)
    if blk > 1:
        nb, rem = divmod(nsteps, blk)
        if nb == 0:
            return [nsteps]
        sizes = [
            s * blk for s in _schedule_sizes(nb, max(1, max_chunk // blk))
        ]
        if rem:
            sizes.append(rem)
        return sizes
    return _schedule_sizes(nsteps, max_chunk)
