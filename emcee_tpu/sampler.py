"""The ensemble sampler driver.

TPU-native counterpart of the reference ``EnsembleSampler``
(``/root/reference/src/emcee/ensemble.py:32-713``).  The user-facing surface
is kept deliberately close (constructor arguments, ``run_mcmc`` /
``sample`` generator, ``get_chain`` family, ``acceptance_fraction``,
backend resume), but the execution model is redesigned for XLA:

* the per-iteration Python loop (``ensemble.py:403-424``) becomes a
  ``jax.lax.scan`` over fused move steps, jit-compiled once per
  (chunk-shape, flags) combination;
* move selection from a weighted mixture (``ensemble.py:406``) happens
  inside the scan via ``jax.lax.switch`` on a key-derived categorical draw;
* the MT19937 ``RandomState`` is replaced by a threefry key carried in the
  state pytree;
* chain storage crosses the device->host boundary once per *chunk* (async
  device_get overlapped with the next chunk's compute) instead of once per
  step (``backend.save_step``, ``ensemble.py:417``) — or not at all with
  the HBM-resident :class:`~.backends.DeviceBackend`;
* move mixtures dispatch per proposal by default; ``mixture_block=B``
  draws the move once per block of ``B`` kept steps so blocks run as
  pure-move scans (no per-proposal ``lax.switch``);
* with a ``jax.sharding.Mesh``, the whole scan runs under ``shard_map`` with
  walkers sharded over the mesh axis; red-blue moves all-gather the
  complementary half over ICI, and everything else stays shard-local.
"""

from __future__ import annotations

import time
import warnings
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

try:  # jax >= 0.4.35 exposes shard_map at top level
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from . import moves as _moves_mod
from .backends import Backend
from .driver import (
    cast_io,
    chunk_schedule,
    grow_blobs_template,
    kick_async_fetch,
    parse_io_dtype,
    parse_moves,
    shim_thin,
)
from .model import Model, wrap_log_prob_fn
from .ops import autocorr
from .utils import defer_interrupts
from .pbar import get_progress_bar
from .state import (
    State,
    as_state,
    coerce_random_state,
    walkers_independent,
)

__all__ = ["EnsembleSampler"]


def _local_walker_block(out):
    """This process's contiguous walker block of a chunk output.

    Every leaf of ``out`` carries the walker axis at position 1
    (``(k, nwalkers, ...)``); under the walker-sharded mesh each
    process's addressable shards tile a contiguous global slice.
    Returns ``(local_out, offset)`` with numpy leaves.
    """
    offsets = []

    def block(arr):
        shards = sorted(
            arr.addressable_shards, key=lambda s: s.index[1].start or 0
        )
        lo = shards[0].index[1].start or 0
        expect = lo
        datas = []
        for s in shards:
            start = s.index[1].start or 0
            if start != expect:
                raise NotImplementedError(
                    "shard_per_process needs a contiguous local "
                    f"walker block; got a shard at {start}, expected "
                    f"{expect}"
                )
            d = np.asarray(s.data)
            datas.append(d)
            expect = start + d.shape[1]
        offsets.append(lo)
        return np.concatenate(datas, axis=1)

    local = jax.tree_util.tree_map(block, out)
    if len(set(offsets)) != 1:
        raise AssertionError(
            f"inconsistent walker offsets across leaves: {offsets}"
        )
    return local, offsets[0]


from .driver import BlobStruct as _BlobStruct  # shared with PTSampler


class EnsembleSampler:
    """An ensemble MCMC sampler for TPU.

    Args:
        nwalkers: number of walkers (global, across all devices).
        ndim: parameter-space dimensionality.
        log_prob_fn: log posterior density.  With ``vectorize=False``
            (default, matching the reference) it maps one ``(ndim,)`` vector
            and is lifted with ``jax.vmap``; with ``vectorize=True`` it maps
            the whole ``(nwalkers, ndim)`` batch.  May return
            ``(log_prob, *blobs)`` tuples; blob structure must be static.
        moves: a move, list of moves, or weighted ``[(move, weight), ...]``
            list (reference ``ensemble.py:115-129``).
        args, kwargs: extra arguments closed over into ``log_prob_fn``.
        backend: a chain store; defaults to the in-memory :class:`Backend`.
        vectorize: see ``log_prob_fn``.
        blobs_dtype: optional numpy dtype (or list of (name, dtype)) applied
            when fetching blobs.
        parameter_names: list of names or dict name -> index/indices; the
            log-prob then receives a dict (reference ``ensemble.py:174-214``).
        seed: int seed or JAX PRNG key for the sampler's own stream
            (used when an initial state carries no key).
        mesh: optional ``jax.sharding.Mesh`` to shard walkers over.
        walker_axis: mesh axis name holding the walker shards.
        host_callback: wrap a non-traceable ``log_prob_fn`` with
            ``jax.pure_callback``.  Blobs on this path require a
            ``host_callback_blobs`` declaration.
        pool: with ``host_callback=True``: the host-side fan-out for
            per-walker log-prob calls — any object with a
            ``.map(fn, iterable)`` (``multiprocessing.Pool``, a
            ``concurrent.futures`` executor) or an int worker count for
            an internally-owned thread pool.  This is the reference's
            ``pool.map`` mechanism (``ensemble.py:489-496``) for
            expensive black-box *Python* likelihoods; JAX-traceable
            models should use ``mesh`` instead.  Without
            ``host_callback`` it is ignored with a warning (on-device
            evaluation is already batched).  Like the reference's pool,
            it is dropped on pickling.
        host_callback_blobs: static structure of per-walker blobs the
            host-callback function returns after the log-prob: a dtype,
            a ``(shape, dtype)`` pair, a list of either, or ``"auto"``
            to probe the function once with the initial coordinates and
            infer the structure (the traced analogue of the reference's
            runtime blob-dtype inference, ``ensemble.py:498-547``).
        io_dtype: optional float dtype for *stored* chain coords and float
            blob leaves (e.g. ``np.float16``).  Casting happens inside the
            jitted chunk, before the device->host transfer, so it halves
            streaming bytes (or, with a ``DeviceBackend``, the HBM chain
            footprint).  The live sampling state and ``log_prob`` stay full
            precision.  Pair with ``Backend(dtype=...)`` /
            ``HDFBackend(dtype=...)`` to keep the host copy compact too.
        max_chunk_steps: optional cap on kept steps per compiled device
            dispatch.  By default the sampler picks 4096 when chunks
            stream to the host (keeps transfer overlap and progress
            granularity useful) and 16384 when they stay on device
            (``store=False`` or a :class:`DeviceBackend`), which is the
            measured throughput plateau on v5e (docs/performance.md
            chunk sweep).  Set explicitly to trade dispatch overhead
            against compile time / progress granularity.
    """

    def __init__(
        self,
        nwalkers,
        ndim,
        log_prob_fn,
        pool=None,
        moves=None,
        args=None,
        kwargs=None,
        backend=None,
        vectorize=False,
        blobs_dtype=None,
        parameter_names=None,
        seed=0,
        prng: Optional[str] = None,
        mesh: Optional[Mesh] = None,
        walker_axis: str = "walkers",
        param_axis: Optional[str] = None,
        host_callback: bool = False,
        io_chunk_bytes: int = 1 << 27,
        scan_unroll: int = 4,
        mixture_block: int = 1,
        io_dtype=None,
        host_callback_blobs=None,
        max_chunk_steps=None,
        # Deprecated v2-era arguments, accepted with the reference's
        # warn-and-ignore semantics (ensemble.py:93-113).
        a=None,
        postargs=None,
        threads=None,
        live_dangerously=None,
        runtime_sortingfn=None,
    ):
        for name, val in (
            ("a", a),
            ("threads", threads),
            ("runtime_sortingfn", runtime_sortingfn),
            ("live_dangerously", live_dangerously),
        ):
            if val is not None:
                warnings.warn(
                    f"The '{name}' argument is deprecated"
                    + (", use 'moves' instead" if name == "a" else ""),
                    DeprecationWarning,
                    stacklevel=2,
                )
        self.nwalkers = int(nwalkers)
        self.ndim = int(ndim)
        if pool is not None and not host_callback:
            warnings.warn(
                "'pool' is ignored without host_callback=True: on-device "
                "evaluation is already batched; use 'mesh' to scale over "
                "chips, or host_callback=True to fan a black-box Python "
                "likelihood out over the pool",
                stacklevel=2,
            )
            pool = None
        if host_callback_blobs is not None and not host_callback:
            raise ValueError(
                "host_callback_blobs requires host_callback=True; "
                "JAX-traceable log-probs return blobs directly"
            )
        # The pool is never pickled (process pools cannot be; the
        # reference drops its pool the same way, ensemble.py:250-256).
        self.pool = pool

        # Parse the move schedule (reference ensemble.py:115-129).
        self._moves, self._weights = parse_moves(
            moves, _moves_mod.StretchMove
        )

        self.backend = Backend() if backend is None else backend
        self.blobs_dtype = blobs_dtype
        if blobs_dtype is not None:
            # Backends that name blob fields on disk (HDFBackend) pick the
            # declared names up from this attribute.
            self.backend.blobs_dtype = blobs_dtype

        self.mesh = mesh
        self.walker_axis = walker_axis
        self.param_axis = param_axis
        self._axis_name = walker_axis if mesh is not None else None
        self._param_axis = (
            param_axis if (mesh is not None and param_axis) else None
        )
        if param_axis is not None and mesh is None:
            raise ValueError("param_axis requires a mesh")
        if mesh is not None:
            n_shards = mesh.shape[walker_axis]
            if self.nwalkers % n_shards != 0:
                raise ValueError(
                    f"nwalkers ({self.nwalkers}) must be divisible by the "
                    f"mesh '{walker_axis}' axis size ({n_shards})"
                )
            if self._param_axis is not None:
                p_shards = mesh.shape[self._param_axis]
                if self.ndim % p_shards != 0:
                    raise ValueError(
                        f"ndim ({self.ndim}) must be divisible by the mesh "
                        f"'{self._param_axis}' axis size ({p_shards})"
                    )

        if isinstance(seed, (int, np.integer)):
            # prng="rbg" uses the TPU hardware RNG path — substantially
            # cheaper per draw than threefry inside the chain step.
            self._key = (
                jax.random.key(seed, impl=prng)
                if prng is not None
                else jax.random.key(seed)
            )
        else:
            self._key = seed

        self._io_chunk_bytes = int(io_chunk_bytes)
        # lax.scan while-loop iterations carry a fixed runtime overhead;
        # unrolling amortizes it (measured ~55us/iteration floor on v5e
        # via the remote runtime — dominant for small ensembles).
        self._scan_unroll = int(scan_unroll)
        # mixture_block > 1: draw the move once per block of that many
        # kept steps instead of once per proposal — amortizes the
        # lax.switch dispatch of move mixtures (docs/performance.md).
        # Chunks whose length isn't a block multiple (e.g. the generator's
        # single-step chunks) fall back to per-proposal selection.
        self._mixture_block = int(mixture_block)
        if self._mixture_block < 1:
            raise ValueError("mixture_block must be >= 1")
        # Optional override of the auto-chosen kept-steps-per-dispatch
        # cap (see _auto_chunk).  None = auto: 4096 when chunks stream to
        # host, 16384 when they stay on device (store=False /
        # DeviceBackend).
        self._max_chunk_steps = (
            None if max_chunk_steps is None else int(max_chunk_steps)
        )
        if (
            self._max_chunk_steps is not None
            and self._max_chunk_steps < 1
        ):
            raise ValueError("max_chunk_steps must be >= 1")
        # Reduced-precision chain streaming: stored coords (and float blob
        # leaves) are cast to this dtype *inside the jitted chunk*, before
        # they cross the device->host boundary — halving transfer bytes
        # (float16) on the bandwidth-bound streaming path, or halving the
        # HBM footprint of a DeviceBackend-resident chain (bfloat16).
        # log_prob is never cast (its magnitude can exceed float16 range
        # for large datasets); the live sampling state stays full
        # precision — only the *stored* copies are compressed.
        self._io_dtype = parse_io_dtype(io_dtype)

        # Named-parameter validation (reference ``ensemble.py:174-214``;
        # plain asserts for exception-type parity).  The canonical form
        # kept on the sampler is the dict name -> index / index-list.
        self.params_are_named = parameter_names is not None
        if self.params_are_named:
            assert isinstance(parameter_names, (list, dict))
            assert not vectorize, (
                "named parameters with vectorization unsupported for now"
            )
            seen = set()
            uniq = [
                n
                for n in parameter_names
                if not (n in seen or seen.add(n))
            ]
            assert len(uniq) == len(parameter_names), (
                f"duplicate parameters: {seen}"
            )
            if isinstance(parameter_names, list):
                assert len(parameter_names) == self.ndim, (
                    "name all parameters or set `parameter_names` to "
                    "`None`"
                )
                parameter_names = {
                    name: i for i, name in enumerate(parameter_names)
                }
            assert len(parameter_names) <= self.ndim, "too many names"
            flat_idx = set()
            for v in parameter_names.values():
                flat_idx.update(v if isinstance(v, list) else [v])
            assert flat_idx == set(range(self.ndim)), (
                f"not all values appear -- set should be 0 to "
                f"{self.ndim - 1}"
            )
            self.parameter_names = parameter_names
        else:
            self.parameter_names = None

        # Canonical batched log-prob (settings kept for re-wrapping after
        # unpickling — the wrapped closure itself is not picklable).
        self.log_prob_fn = log_prob_fn
        self._lp_settings = dict(
            args=args,
            kwargs=kwargs,
            vectorize=vectorize,
            parameter_names=parameter_names,
            host_callback=host_callback,
            callback_blobs=host_callback_blobs,
            # Without a declared blobs_dtype, traced blobs follow the
            # reference's array-packing semantics (uniform multi-blob
            # returns stack into one array; size-1 axes squeeze —
            # ensemble.py:514-546).  A declared dtype keeps one pytree
            # leaf per field so the named-field packing works.
            reference_blob_layout=(blobs_dtype is None),
        )
        self._compute_log_prob = wrap_log_prob_fn(
            log_prob_fn, pool=self.pool, **self._lp_settings
        )
        self._evaluation_mode = (
            "host-callback" if host_callback else "traced"
        )
        if not host_callback and mesh is None:
            # Traceability probe (abstract — no compile, pure_callbacks
            # not invoked).  Reference-style functions with
            # data-dependent Python branches, float()/bool() casts,
            # numpy-only ops, or string/object blobs cannot trace; fall
            # back to per-walker host evaluation (the reference's own
            # execution model, ensemble.py:486-547) with full dynamic /
            # object blob support instead of failing at first run.
            # Under a mesh the traced path is required — the original
            # trace error surfaces at first use there.
            probe = jax.ShapeDtypeStruct(
                (self.nwalkers, self.ndim),
                jax.dtypes.canonicalize_dtype(jnp.float64),
            )
            try:
                jax.eval_shape(self._compute_log_prob, probe)
            except Exception:
                self._lp_settings["host_callback"] = True
                self._lp_settings["callback_blobs"] = "auto-reference"
                self._compute_log_prob = wrap_log_prob_fn(
                    self.log_prob_fn, pool=self.pool, **self._lp_settings
                )
                self._evaluation_mode = "host-fallback"
        self._model = self._build_model()

        # Resume from a non-empty backend (reference ensemble.py:139-162).
        self._previous_state = None
        if self.backend.initialized:
            state_shape = self.backend.shape
            if state_shape != (self.nwalkers, self.ndim):
                raise ValueError(
                    "the shape of the backend is incompatible with the "
                    f"shape of the sampler; expected "
                    f"{(self.nwalkers, self.ndim)}, got {state_shape}"
                )
            if self.backend.iteration > 0:
                if getattr(
                    self.backend, "shard_per_process", False
                ) and jax.process_count() > 1:
                    # A shard file holds only this process's walkers;
                    # there is no global resume state to adopt.  Resume
                    # a sharded run via merge_shards() + a normal
                    # backend, or pass an explicit initial state.
                    self._previous_state = None
                else:
                    self._previous_state = (
                        self.backend.get_last_sample()
                    )
        else:
            self.backend.reset(self.nwalkers, self.ndim)

        self._run_chunk_cache = {}

    def __getstate__(self):
        # Jitted chunk runners and wrapped log-prob closures are not
        # picklable; they rebuild after unpickling (the reference
        # similarly drops its pool, ensemble.py:250-256).
        d = self.__dict__.copy()
        d["_run_chunk_cache"] = {}
        d["_compute_log_prob"] = None
        d["_model"] = None
        d["pool"] = None  # pools don't pickle (reference parity)
        return d

    def __setstate__(self, d):
        self.__dict__.update(d)
        self._compute_log_prob = wrap_log_prob_fn(
            self.log_prob_fn, pool=self.pool, **self._lp_settings
        )
        self._model = self._build_model()

    def _build_model(self) -> Model:
        if self._param_axis is not None:
            # Long-ndim mode: the user log-prob computes a shard-local
            # partial sum over its parameter block; psum completes it
            # (the "sequence parallelism" analogue — SURVEY §5).
            base_fn = self._compute_log_prob
            paxis = self._param_axis

            def _sharded_log_prob(q):
                lp, blobs = base_fn(q)
                if blobs is not None:
                    raise NotImplementedError(
                        "blobs are not supported with parameter-axis "
                        "sharding"
                    )
                return jax.lax.psum(lp, paxis), None

            model_log_prob = _sharded_log_prob
            partial_log_prob = base_fn
        else:
            model_log_prob = self._compute_log_prob
            partial_log_prob = None
        return Model(
            compute_log_prob=model_log_prob,
            axis_name=self._axis_name,
            nwalkers=self.nwalkers,
            param_axis=self._param_axis,
            ndim=self.ndim,
            compute_log_prob_partial=partial_log_prob,
            grad_ok=not self._lp_settings.get("host_callback", False),
        )

    # ------------------------------------------------------------------
    # Introspection properties (reference ensemble.py:555-623)
    # ------------------------------------------------------------------
    @property
    def iteration(self):
        return self.backend.iteration

    @property
    def acceptance_fraction(self):
        """Per-walker fraction of accepted saved-step proposals."""
        return self.backend.accepted / float(self.backend.iteration)

    @property
    def random_state(self):
        """The sampler's PRNG key (the reference exposes its MT19937
        state here, ``ensemble.py:217-237``; the JAX equivalent is the
        key the next proposal will consume)."""
        if (
            self._previous_state is not None
            and self._previous_state.random_state is not None
        ):
            return self._previous_state.random_state
        return self._key

    @random_state.setter
    def random_state(self, key):
        self._key = key
        if self._previous_state is not None:
            self._previous_state = self._previous_state._replace(
                random_state=key
            )

    def _deprecated(self, instead):
        warnings.warn(
            f"this attribute is deprecated; use '{instead}' instead "
            "(reference ensemble.py:560-595 keeps the same shims)",
            DeprecationWarning,
            stacklevel=3,
        )

    _shim_thin = staticmethod(shim_thin)

    @property
    def chain(self):
        """Deprecated v2 layout ``(nwalkers, steps, ndim)``."""
        self._deprecated("get_chain()")
        return np.swapaxes(np.asarray(self.get_chain()), 0, 1)

    @property
    def flatchain(self):
        self._deprecated("get_chain(flat=True)")
        return self.get_chain(flat=True)

    @property
    def lnprobability(self):
        self._deprecated("get_log_prob()")
        return np.swapaxes(np.asarray(self.get_log_prob()), 0, 1)

    @property
    def flatlnprobability(self):
        self._deprecated("get_log_prob(flat=True)")
        return self.get_log_prob(flat=True)

    @property
    def blobs(self):
        self._deprecated("get_blobs()")
        return self.get_blobs()

    @property
    def flatblobs(self):
        self._deprecated("get_blobs(flat=True)")
        return self.get_blobs(flat=True)

    @property
    def acor(self):
        self._deprecated("get_autocorr_time()")
        return self.get_autocorr_time()

    def get_chain(self, **kwargs):
        return self.get_value("chain", **kwargs)

    def get_log_prob(self, **kwargs):
        return self.get_value("log_prob", **kwargs)

    def get_blobs(self, **kwargs):
        if self.blobs_dtype is None:
            return self.get_value("blobs", **kwargs)
        # Named blobs (reference ``blobs_dtype``, docs/user/blobs.rst):
        # fetch unflattened so the leading (iteration, nwalkers) axes are
        # unambiguous, pack the pytree leaves into a structured array whose
        # fields follow the declared [(name, dtype), ...] order (leaf order
        # = jax.tree_util.tree_leaves order), then flatten on request.
        flat = kwargs.pop("flat", False)
        blobs = self.get_value("blobs", **kwargs)
        if blobs is None:
            return None
        if isinstance(blobs, np.ndarray) and blobs.dtype.names is not None:
            out = blobs  # HDF backend already stores structured records
        else:
            declared = np.dtype(self.blobs_dtype)
            leaves = [np.asarray(x) for x in jax.tree_util.tree_leaves(blobs)]
            if len(leaves) != len(declared.names):
                raise ValueError(
                    f"blobs_dtype declares {len(declared.names)} fields but "
                    f"the log-prob returns {len(leaves)} blobs"
                )
            # Field sub-shapes come from the stored leaves (everything past
            # the (iteration, nwalkers) lead), base dtypes from the
            # declaration.
            dtype = np.dtype(
                [
                    (name, declared[name].base, leaf.shape[2:])
                    for name, leaf in zip(declared.names, leaves)
                ]
            )
            out = np.empty(leaves[0].shape[:2], dtype=dtype)
            for name, leaf in zip(declared.names, leaves):
                out[name] = leaf
        if flat:
            return out.reshape((-1,) + out.shape[2:])
        return out

    def get_value(self, name, **kwargs):
        return self.backend.get_value(name, **kwargs)

    def get_last_sample(self):
        return self.backend.get_last_sample()

    def get_autocorr_time(self, **kwargs):
        return self.backend.get_autocorr_time(**kwargs)

    def reset(self):
        """Clear the backend chain (reference ensemble.py:244-249).

        Move carries (tuned proposal scales, sequential dim counters) are
        deliberately KEPT: in the reference that state lives on the move
        objects, which ``reset()`` never touches — so the canonical
        tuned-burn-in -> ``reset()`` -> production flow keeps its adapted
        scales.  Build a fresh sampler (or move) to discard them.
        ``_previous_state`` also survives (reference ``ensemble.py:244``
        leaves it untouched), so ``reset(); run_mcmc(None, n)`` continues
        from the burn-in's final ensemble.
        """
        self.backend.reset(self.nwalkers, self.ndim)

    def _object_blob_mode(self):
        """Whether blobs live in the host-side object store (untraceable
        log-prob fallback, or ``host_callback_blobs='__object__'``)."""
        bs = getattr(self._compute_log_prob, "_blob_state", None)
        return bool(bs is not None and bs()[0])

    def _blob_store(self):
        bs = getattr(self._compute_log_prob, "_blob_state", None)
        return None if bs is None else bs()[1]

    def _resolve_object_blobs(self, blobs):
        """Translate device-side int32 blob handles into the reference's
        blob arrays (object dtype for ragged/string blobs)."""
        ids = np.asarray(jax.device_get(blobs))
        return self._blob_store().resolve(ids, self.blobs_dtype)

    def _public_state(self, state):
        """The state handed to users: in object-blob mode, swap the
        internal handles for the resolved per-walker blob values."""
        if state.blobs is None or not self._object_blob_mode():
            return state
        return state._replace(
            blobs=self._resolve_object_blobs(state.blobs)
        )

    def compute_log_prob(self, coords):
        """Evaluate the batched log-prob with host-side NaN/inf guards.

        Mirrors the eager checks of the reference (``ensemble.py:458-551``);
        inside the jitted chain step NaN log-probs are simply rejected by
        the Metropolis compare instead.  All guards fuse into ONE jitted
        program: separate eager ops each pay a full remote-compile round
        trip on the TPU runtime (~60 s apiece cold), which dominated
        first-run latency.  In object-blob mode the returned blobs are
        the resolved per-walker values, not the internal handles.
        """
        log_prob, blobs = self._compute_eval(coords)
        if blobs is not None and self._object_blob_mode():
            blobs = self._resolve_object_blobs(blobs)
        return log_prob, blobs

    def _compute_eval(self, coords):
        """compute_log_prob without the object-handle resolution (the
        chunked chain step carries raw handles through the scan)."""
        if self._lp_settings.get("callback_blobs") in (
            "auto",
            "auto-reference",
        ):
            # Direct compute_log_prob() use before any run: resolve the
            # pending host-side blob probe with these concrete coords.
            self._lp_settings["callback_blobs"] = (
                self._compute_log_prob._infer_blobs(np.asarray(coords))
            )
        p = jnp.asarray(coords)
        guard = self._run_chunk_cache.get("_guard")
        if guard is None:

            def guarded(q):
                lp, blobs = self._compute_log_prob(q)
                return (
                    lp,
                    blobs,
                    jnp.any(jnp.isinf(q)),
                    jnp.any(jnp.isnan(q)),
                    jnp.any(jnp.isnan(lp)),
                )

            guard = jax.jit(guarded)
            self._run_chunk_cache["_guard"] = guard
        log_prob, blobs, has_inf, has_nan, lp_nan = guard(p)
        has_inf, has_nan, lp_nan = jax.device_get(
            (has_inf, has_nan, lp_nan)
        )
        if has_inf:
            raise ValueError("At least one parameter value was infinite")
        if has_nan:
            raise ValueError("At least one parameter value was NaN")
        if lp_nan:
            raise ValueError("Probability function returned NaN")
        return log_prob, blobs

    # ------------------------------------------------------------------
    # Step construction
    # ------------------------------------------------------------------
    def _init_carries(self):
        return tuple(
            m.init_carry(self.nwalkers, self.ndim) for m in self._moves
        )

    def _make_step(self, tune, move_index=None):
        """One proposal: select a move, propose, (optionally) tune.

        With ``move_index`` the move is fixed (no per-step categorical draw
        or ``lax.switch``) — the building block of the ``mixture_block``
        execution mode, where the move is drawn once per block of kept
        steps instead of once per proposal.
        """
        moves = self._moves
        model = self._model
        n_moves = len(moves)
        weights = jnp.asarray(self._weights)

        def apply_move(i, k, st, cs):
            mv = moves[i]
            if getattr(mv, "wants_tune_flag", False):
                ns, acc, c = mv.propose(k, st, model, cs[i], tune=tune)
            else:
                ns, acc, c = mv.propose(k, st, model, cs[i])
            if tune:
                c = mv.tune(c, ns, acc, model)
            return ns, acc, cs[:i] + (c,) + cs[i + 1 :]

        if n_moves == 1 or move_index is not None:
            i = 0 if move_index is None else int(move_index)

            def fixed_step(state, carries):
                # Same 3-way split as the mixture path (k_move unused)
                # so streams stay identical across execution modes.
                key, _k_move, k_prop = jax.random.split(
                    state.random_state, 3
                )
                state = state._replace(random_state=key)
                return apply_move(i, k_prop, state, carries)

            return fixed_step

        def step(state, carries):
            key, k_move, k_prop = jax.random.split(state.random_state, 3)
            state = state._replace(random_state=key)
            idx = jax.random.choice(k_move, n_moves, p=weights)

            def make_branch(i):
                def branch(operand):
                    k, st, cs = operand
                    return apply_move(i, k, st, cs)

                return branch

            return jax.lax.switch(
                idx,
                [make_branch(i) for i in range(n_moves)],
                (k_prop, state, carries),
            )

        return step

    def _blob_partition_tree(self, blobs, spec):
        if blobs is None:
            return None
        if isinstance(blobs, _BlobStruct):
            blobs = blobs.example
        return jax.tree_util.tree_map(lambda _: spec, blobs)

    def _get_run_chunk(self, nkeep, thin_by, store, tune, blobs_struct):
        """Build (and cache) the jitted chunk runner.

        The runner advances ``nkeep * thin_by`` proposals via nested scans,
        emitting the state after every ``thin_by``-th proposal (reference
        thinning semantics, ``ensemble.py:377-386,403-424``) along with that
        proposal's acceptance vector (the reference saves exactly the last
        proposal's ``accepted`` per kept step, ``ensemble.py:409-417``).
        """
        cache_key = (nkeep, thin_by, store, tune, blobs_struct)
        fn = self._run_chunk_cache.get(cache_key)
        if fn is not None:
            return fn

        def make_kept_step(step):
            def inner(carry, _):
                state, carries = carry
                state, accepted, carries = step(state, carries)
                return (state, carries), None

            def kept_step(carry, _):
                if thin_by > 1:
                    carry, _ = jax.lax.scan(
                        inner,
                        carry,
                        None,
                        length=thin_by - 1,
                        unroll=min(self._scan_unroll, thin_by - 1),
                    )
                state, carries = carry
                state, accepted, carries = step(state, carries)
                if store:
                    out = (
                        self._cast_io(state.coords),
                        state.log_prob,
                        jax.tree_util.tree_map(
                            self._cast_io, state.blobs
                        ),
                        accepted,
                    )
                else:
                    out = None
                return (state, carries), out

            return kept_step

        blk = self._mixture_block
        n_moves = len(self._moves)
        if n_moves > 1 and blk > 1 and nkeep % blk == 0:
            # Blocked mixture: draw the move once per block of `blk` kept
            # steps; each block runs a pure-move scan (no per-proposal
            # lax.switch buffer traffic).  A state-independent schedule of
            # π-invariant kernels keeps the chain valid; statistical
            # coverage: tests/integration/test_mixture.py.
            kept_steps = [
                make_kept_step(self._make_step(tune, move_index=i))
                for i in range(n_moves)
            ]
            weights = jnp.asarray(self._weights)

            def block_step(carry, _):
                state, carries = carry
                key, k_move = jax.random.split(state.random_state)
                state = state._replace(random_state=key)
                idx = jax.random.choice(k_move, n_moves, p=weights)

                def make_branch(i):
                    def branch(operand):
                        st, cs = operand
                        (st, cs), outs = jax.lax.scan(
                            kept_steps[i],
                            (st, cs),
                            None,
                            length=blk,
                            unroll=min(self._scan_unroll, blk),
                        )
                        return st, cs, outs

                    return branch

                state, carries, outs = jax.lax.switch(
                    idx,
                    [make_branch(i) for i in range(n_moves)],
                    (state, carries),
                )
                return (state, carries), outs

            def chunk(state, carries):
                (state, carries), outs = jax.lax.scan(
                    block_step, (state, carries), None, length=nkeep // blk
                )
                if store:
                    outs = jax.tree_util.tree_map(
                        lambda o: o.reshape((nkeep,) + o.shape[2:]), outs
                    )
                return state, carries, outs

        else:
            kept_step = make_kept_step(self._make_step(tune))

            def chunk(state, carries):
                (state, carries), outs = jax.lax.scan(
                    kept_step,
                    (state, carries),
                    None,
                    length=nkeep,
                    unroll=min(self._scan_unroll, nkeep),
                )
                return state, carries, outs

        if self.mesh is not None:
            ax = self.walker_axis
            pw = P(ax)
            pr = P()
            state_spec = State(
                coords=P(ax, self._param_axis),
                log_prob=pw,
                random_state=pr,
                blobs=self._blob_partition_tree(blobs_struct, pw),
            )
            carries_spec = jax.tree_util.tree_map(
                lambda _: pr, self._init_carries()
            )
            if store:
                out_spec = (
                    P(None, ax, self._param_axis),
                    P(None, ax),
                    self._blob_partition_tree(blobs_struct, P(None, ax)),
                    P(None, ax),
                )
            else:
                out_spec = None
            chunk = _shard_map(
                chunk,
                mesh=self.mesh,
                in_specs=(state_spec, carries_spec),
                out_specs=(state_spec, carries_spec, out_spec),
                check_vma=False,
            )

        fn = jax.jit(chunk)
        self._run_chunk_cache[cache_key] = fn
        return fn

    def _device_put_state(self, state):
        if self.mesh is None:
            return state
        ax = self.walker_axis
        shardings = State(
            coords=NamedSharding(self.mesh, P(ax, self._param_axis)),
            log_prob=NamedSharding(self.mesh, P(ax)),
            random_state=NamedSharding(self.mesh, P()),
            blobs=self._blob_partition_tree(
                state.blobs, NamedSharding(self.mesh, P(ax))
            ),
        )
        from .parallel.multihost import tree_put

        return tree_put(state, shardings)

    # ------------------------------------------------------------------
    # Sampling
    # ------------------------------------------------------------------
    def _prepare_state(
        self, initial_state, skip_initial_state_check, trusted=False
    ):
        """``trusted=True``: the state is this sampler's own resume
        anchor (produced by the validated run loop, or restored from a
        backend this sampler's save path wrote) — skip the
        host-roundtrip sanity checks (walkers_independent and the NaN
        fetch of log_prob cost a tunnel roundtrip per run_mcmc call,
        ~14% of a 16384-step dispatch at the headline shape)."""
        state = as_state(initial_state)
        if (
            isinstance(state.coords, np.ndarray)
            and state.coords.dtype == np.longdouble
        ):
            # XLA has no extended-precision float: sample in float64
            # (reference issue #312's "doesn't crash" contract; the
            # storage-side longdouble path is backend-only).
            state = state._replace(
                coords=state.coords.astype(np.float64),
                log_prob=None
                if state.log_prob is None
                else np.asarray(state.log_prob, dtype=np.float64),
            )
        if state.coords.shape != (self.nwalkers, self.ndim):
            raise ValueError(
                f"incompatible input dimensions {state.coords.shape}"
            )
        if (
            self._io_dtype is not None
            and state.coords.dtype == self._io_dtype
            and self._io_dtype.itemsize < 4
        ):
            # Resuming from a backend that stored the chain at reduced
            # precision: upcast so the *sampling* stays full precision
            # (float64 when x64 is enabled), and drop the cached
            # log_prob/blobs — they belong to the unrounded coords, and
            # a stale value would bias accept ratios for walkers that
            # keep rejecting.
            full = jax.dtypes.canonicalize_dtype(jnp.float64)
            state = state._replace(
                coords=jnp.asarray(state.coords, dtype=full),
                log_prob=None,
                blobs=None,
            )
        if (
            not trusted
            and not skip_initial_state_check
            and not walkers_independent(state.coords)
        ):
            raise ValueError(
                "Initial state has a large condition number. "
                "Make sure that your walkers are linearly independent for "
                "the best performance"
            )
        # Backends hand out raw key data (indexable, reference-style);
        # reference users may pass a numpy RandomState tuple, which has
        # no JAX stream — fall back to the sampler's own key there
        # (documented RNG divergence).
        key = coerce_random_state(state.random_state)
        if key is None:
            self._key, key = jax.random.split(self._key)
        state = state._replace(random_state=key)
        if self._lp_settings.get("callback_blobs") in (
            "auto",
            "auto-reference",
        ):
            # One host-side probe with the real initial coordinates
            # resolves the blob structure before anything traces; the
            # concrete spec is persisted so pickled/rebuilt samplers
            # skip the probe.
            self._lp_settings["callback_blobs"] = (
                self._compute_log_prob._infer_blobs(
                    np.asarray(state.coords)
                )
            )
        if self._object_blob_mode():
            if self.mesh is not None:
                raise ValueError(
                    "object blobs (host-side blob store) cannot run "
                    "under a device mesh"
                )
            if getattr(self.backend, "wants_device_arrays", False):
                raise ValueError(
                    "DeviceBackend keeps the chain in HBM and cannot "
                    "store host-side object blobs; use the in-memory "
                    "Backend"
                )
            if state.blobs is not None:
                # Resumed/foreign states carry resolved blob VALUES (or
                # handles from a dead store, e.g. after unpickling);
                # only live handles from THIS store are usable inside
                # the chunk — otherwise drop and re-evaluate.
                ids = np.asarray(jax.device_get(state.blobs))
                if ids.dtype != np.int32 or not self._blob_store(
                ).has_all(ids):
                    state = state._replace(log_prob=None, blobs=None)
        elif (
            state.blobs is not None
            and isinstance(state.blobs, np.ndarray)
            and (
                state.blobs.dtype.names is not None
                or state.blobs.dtype == np.dtype("object")
            )
        ):
            # get_last_sample hands users structured record rows
            # (declared blobs_dtype); those are storage views, not
            # traceable leaves — drop and recompute from coords.
            state = state._replace(blobs=None)
        if state.log_prob is None:
            log_prob, blobs = self._compute_eval(state.coords)
            state = state._replace(log_prob=log_prob, blobs=blobs)
            # Stale-trace guard (reference ``tests/unit/test_blobs.py``
            # blob-mismatch case): a Python-side change to the log-prob
            # function does NOT invalidate jit's cached trace, so a
            # function whose blob structure changed would silently keep
            # returning the old structure.  Re-trace abstractly (cheap,
            # no compile; pure_callbacks are not invoked) and compare.
            self._check_blob_struct_fresh(state.blobs, state.coords)
        else:
            if np.shape(state.log_prob) != (self.nwalkers,):
                raise ValueError("incompatible input dimensions")
            lp = None if trusted else state.log_prob
            if isinstance(lp, jax.Array) and not lp.is_fully_addressable:
                # Resumed multi-process state: validate this process's
                # shards (every process runs the same check on its own
                # slice — no cross-host gather for a sanity check).
                lp = np.concatenate(
                    [
                        np.asarray(s.data).ravel()
                        for s in lp.addressable_shards
                    ]
                )
            if lp is not None and np.any(np.isnan(np.asarray(lp))):
                raise ValueError("The initial log_prob was NaN")
            if state.blobs is None:
                # Blob structure must exist up front under jit; probe it.
                _, blobs_struct = jax.eval_shape(
                    self._compute_log_prob, state.coords
                )
                if blobs_struct is not None:
                    log_prob, blobs = self._compute_eval(state.coords)
                    state = state._replace(log_prob=log_prob, blobs=blobs)
            else:
                # The reverse mismatch: a resumed blob-ful state with a
                # model that no longer returns blobs would silently
                # freeze the stale blob values into every stored row
                # (the accept select has no new leaves to pick from).
                _, blobs_struct = jax.eval_shape(
                    self._compute_log_prob, state.coords
                )
                if blobs_struct is None:
                    raise ValueError(
                        "inconsistent use of blobs: the resumed state "
                        "carries blobs but the log-prob returns none"
                    )
        return self._device_put_state(state)

    def _check_blob_struct_fresh(self, blobs, coords):
        """Raise if the live Python log-prob's blob structure no longer
        matches what the cached trace produced (jit caches the first
        trace; shape changes after it are otherwise silent).
        ``jax.eval_shape`` caches traces by function identity and would
        return the stale structure; a throwaway lambda forces a genuine
        re-trace (its cache entry dies with it)."""
        wrapped = self._compute_log_prob
        _, fresh = jax.eval_shape(
            lambda c: wrapped(c),
            jax.ShapeDtypeStruct(np.shape(coords), coords.dtype),
        )

        def sig(tree):
            if tree is None:
                return None
            return [
                (tuple(np.shape(leaf)), np.dtype(leaf.dtype).name)
                for leaf in jax.tree_util.tree_leaves(tree)
            ]

        if sig(blobs) != sig(fresh):
            raise ValueError(
                "inconsistent use of blobs: the log-prob function's "
                "blob structure changed after this sampler first traced "
                f"it (traced {sig(blobs)}, the function now returns "
                f"{sig(fresh)}); jit caches the first trace — construct "
                "a fresh sampler for the new structure"
            )

    def _blobs_struct(self, state):
        if state.blobs is None:
            return None
        # Hashable structural token for the jit cache; also used to build
        # PartitionSpec trees (tree structure only matters there).
        leaves, treedef = jax.tree_util.tree_flatten(state.blobs)
        shapes = tuple(
            (tuple(leaf.shape), jnp.asarray(leaf).dtype.name)
            for leaf in leaves
        )
        return _BlobStruct(treedef, shapes, state.blobs)

    def _grow_blobs_template(self, blobs):
        if blobs is not None and self._object_blob_mode():
            # The backend stores resolved blob VALUES; hand it a
            # resolved per-walker row so it allocates the right
            # (possibly object-dtype) storage.
            return self._resolve_object_blobs(blobs)
        return grow_blobs_template(blobs, self._io_dtype)

    def _cast_io(self, x):
        return cast_io(x, self._io_dtype)

    def _io_itemsize(self, dtype):
        if self._io_dtype is not None and jnp.issubdtype(
            dtype, jnp.floating
        ):
            return self._io_dtype.itemsize
        return dtype.itemsize

    def _auto_chunk(self, state, thin_by, store=True):
        """Kept-steps per device dispatch, bounded by io_chunk_bytes."""
        bytes_per_step = state.coords.size * self._io_itemsize(
            state.coords.dtype
        )
        bytes_per_step += state.log_prob.size * state.log_prob.dtype.itemsize
        bytes_per_step += state.nwalkers * 4
        if state.blobs is not None:
            for leaf in jax.tree_util.tree_leaves(state.blobs):
                bytes_per_step += leaf.size * self._io_itemsize(leaf.dtype)
        if store:
            n = max(1, self._io_chunk_bytes // max(1, bytes_per_step))
        else:
            # store=False emits no chunk outputs at all — there is no
            # transfer or HBM buffer for io_chunk_bytes to bound, and
            # capping by it silently fragmented large-ensemble runs
            # into ~32-step dispatches (the 1e5-walker headline paid
            # ~85 ms/window in dispatch floors before this).
            n = 1 << 62
        # Cap the scan length (chunk-length sweep in docs/performance.md):
        # on the host-transfer path 4096 steps/chunk keeps host-overlap
        # granularity and progress updates usable while the throughput
        # curve is within ~5% of flat; with no per-chunk host transfer
        # (store=False, or an HBM-resident DeviceBackend) longer scans
        # keep amortizing dispatch overhead, so the cap lifts to 16384 —
        # the headline-bench operating point.  ``max_chunk_steps=``
        # overrides both.
        if self._max_chunk_steps is not None:
            cap = self._max_chunk_steps
        elif self._object_blob_mode():
            # Per-proposal host callbacks dominate anyway; short chunks
            # bound the host blob table between prunes.
            cap = 256
        elif not store or getattr(
            self.backend, "wants_device_arrays", False
        ):
            cap = 16384
        else:
            cap = 4096
        return int(min(n, cap))

    def _chunk_schedule(self, nsteps, max_chunk):
        blk = self._mixture_block if len(self._moves) > 1 else 1
        return chunk_schedule(nsteps, max_chunk, blk)

    def sample(
        self,
        initial_state,
        iterations=1,
        tune=False,
        skip_initial_state_check=False,
        thin_by=1,
        store=True,
        progress=False,
        progress_kwargs=None,
        thin=None,  # deprecated; trailing so positional calls don't shift
    ):
        """Advance the chain as a generator, yielding every ``thin_by``.

        Matches the reference generator semantics (``ensemble.py:258-424``)
        including ``iterations=None`` infinite streaming (requires
        ``store=False``) and the deprecated ``thin=`` argument (counts
        proposals; ``thin_by`` counts kept steps).  One divergence under
        ``thin=``: this generator yields once per *kept* step
        (``iterations // thin`` yields), where the reference yielded
        every proposal — the chain advances in compiled blocks here, so
        per-proposal host callbacks have no equivalent.
        """
        if iterations is None and store:
            raise ValueError("'store' must be False when 'iterations' is None")
        if thin is not None:
            iterations, thin_by = self._shim_thin(iterations, thin)
        thin_by = int(thin_by)
        if thin_by <= 0:
            raise ValueError("Invalid thinning argument")

        state = self._prepare_state(initial_state, skip_initial_state_check)
        carries = getattr(self, "_move_carries", None)
        if carries is None:
            carries = self._init_carries()
        blobs_struct = self._blobs_struct(state)

        if store:
            self.backend.grow(
                iterations, self._grow_blobs_template(state.blobs)
            )

        run1 = self._get_run_chunk(1, thin_by, store, tune, blobs_struct)

        total = None if iterations is None else iterations * thin_by
        with get_progress_bar(progress, total, **(progress_kwargs or {})) as pbar:
            i = 0
            while iterations is None or i < iterations:
                state, carries, out = run1(state, carries)
                with defer_interrupts():
                    if store:
                        self._save_chunk(out, state.random_state)
                    self._move_carries = carries
                    self._previous_state = state
                if (
                    not store
                    and state.blobs is not None
                    and self._object_blob_mode()
                ):
                    # Nothing stores the handles on this path; keep the
                    # host blob table bounded to the live ensemble
                    # (matters for iterations=None infinite streaming).
                    ids = np.asarray(jax.device_get(state.blobs))
                    self._blob_store().prune(
                        keep_ids=ids, below=self._blob_store()._next
                    )
                pbar.update(thin_by)
                i += 1
                yield self._public_state(state)

    def run_mcmc(self, initial_state, nsteps, **kwargs):
        """Run ``nsteps`` kept steps and return the final :class:`State`.

        Accepts ``initial_state=None`` to continue from the previous run
        (reference ``ensemble.py:441-447``).  Unlike the reference this does
        not iterate a Python generator step-by-step: the chain advances in
        jitted multi-step chunks with chain storage overlapped.
        """
        trusted = False
        if initial_state is None:
            if self._previous_state is None:
                raise ValueError(
                    "Cannot have `initial_state=None` if run_mcmc has never "
                    "been called."
                )
            initial_state = self._previous_state
            trusted = True

        tune = kwargs.pop("tune", False)
        thin_by = int(kwargs.pop("thin_by", 1))
        thin = kwargs.pop("thin", None)
        if thin is not None:
            nsteps, thin_by = self._shim_thin(nsteps, thin)
        store = kwargs.pop("store", True)
        progress = kwargs.pop("progress", False)
        progress_kwargs = kwargs.pop("progress_kwargs", None) or {}
        skip_check = kwargs.pop("skip_initial_state_check", False)
        accurate_timing = kwargs.pop("accurate_timing", False)
        if kwargs:
            raise TypeError(f"unexpected keyword arguments: {list(kwargs)}")
        if thin_by <= 0:
            raise ValueError("Invalid thinning argument")
        nsteps = int(nsteps)

        state = self._prepare_state(
            initial_state, skip_check, trusted=trusted
        )
        if nsteps == 0:
            # Reference semantics (``ensemble.py:449-456``): zero
            # iterations produce no results — the resume anchor is
            # cleared (run_mcmc(None, n) afterwards raises) and None is
            # returned, exactly as the reference's empty generator loop
            # leaves ``results = None``.
            self._previous_state = None
            return None
        # Move carries (e.g. tuned proposal scales, sequential dim
        # counters) persist across calls like the reference's stateful
        # move objects; reset() keeps them (reference move-object
        # semantics: reset only clears the backend).
        carries = getattr(self, "_move_carries", None)
        if carries is None:
            carries = self._init_carries()
        blobs_struct = self._blobs_struct(state)

        if store:
            self.backend.grow(
                nsteps, self._grow_blobs_template(state.blobs)
            )

        schedule = self._chunk_schedule(
            nsteps, self._auto_chunk(state, thin_by, store)
        )
        total = nsteps * thin_by
        from .profiling import RunStats

        stats = RunStats(
            nsteps=nsteps,
            nproposals=total,
            nwalkers=self.nwalkers,
        )
        t_run = time.perf_counter()
        # Overlap: fetch chunk k while k+1 computes.  Each pending entry
        # carries the resume anchors (post-chunk state + carries) so the
        # anchors only ever advance together with the data that actually
        # reached the backend — a chunk whose save was interrupted
        # leaves the anchors at the previous consistent point and is
        # simply recomputed on resume (same PRNG state, identical chain).
        pending = None  # (out, state_after, carries_after)
        try:
            with get_progress_bar(
                progress, total, **progress_kwargs
            ) as pbar:
                for n in schedule:
                    t_chunk = time.perf_counter()
                    run = self._get_run_chunk(
                        n, thin_by, store, tune, blobs_struct
                    )
                    state, carries, out = run(state, carries)
                    if store:
                        if not getattr(
                            self.backend, "wants_device_arrays", False
                        ):
                            kick_async_fetch(out)
                        if pending is not None:
                            # Consume before saving: a KeyboardInterrupt
                            # landing inside _save_chunk must not trigger
                            # a second (double-appending) save from the
                            # finally block below.  SIGINT is deferred so
                            # the commit and the anchor updates are
                            # atomic with respect to Ctrl-C.
                            p, pending = pending, None
                            with defer_interrupts():
                                self._save_chunk(p[0], p[1].random_state)
                                self._previous_state = p[1]
                                self._move_carries = p[2]
                        pending = (out, state, carries)
                    else:
                        with defer_interrupts():
                            self._previous_state = state
                            self._move_carries = carries
                        if (
                            state.blobs is not None
                            and self._object_blob_mode()
                        ):
                            # Nothing stores the handles; only the live
                            # ensemble's survive each chunk.
                            ids = np.asarray(
                                jax.device_get(state.blobs)
                            )
                            self._blob_store().prune(
                                keep_ids=ids,
                                below=self._blob_store()._next,
                            )
                    stats.chunks += 1
                    stats.chunk_times.append(time.perf_counter() - t_chunk)
                    pbar.update(n * thin_by)
        finally:
            # Interrupt safety: every chunk whose save completes reaches
            # the backend even when the loop is killed mid-run (Ctrl-C,
            # a preemption signal raised in-process) — the reference
            # gets this by paying a disk write per step (hdf.py:243-267).
            # The stored chain and the resume anchors are always
            # mutually consistent; at most the in-flight chunks (the one
            # being saved plus the one just computed) are discarded and
            # recomputed by run_mcmc(None, n).
            if store and pending is not None:
                p, pending = pending, None
                with defer_interrupts():
                    self._save_chunk(p[0], p[1].random_state)
                    self._previous_state = p[1]
                    self._move_carries = p[2]

        # Block so failures surface here.  (By default no forced value
        # fetch: a per-run device_get costs a tunnel roundtrip; see
        # RunStats.walltime_s's accuracy caveat.  accurate_timing=True
        # opts into one (nwalkers,) transfer so the timing window
        # provably covers execution on runtimes whose block_until_ready
        # releases early.)
        jax.block_until_ready(state.coords)
        if accurate_timing:
            np.asarray(jax.device_get(state.log_prob))
            stats.accurate = True
        stats.walltime_s = time.perf_counter() - t_run
        self.last_run_stats = stats
        return self._public_state(state)

    def _save_chunk(self, out, key):
        if self._object_blob_mode() and out[2] is not None:
            if jax.process_count() > 1:
                raise NotImplementedError(
                    "object blobs are per-process host state; "
                    "multi-host runs need declared numeric blobs"
                )
            coords, log_prob, ids, accepted = out
            ids = np.asarray(jax.device_get(ids))
            store = self._blob_store()
            blobs = store.resolve(ids, self.blobs_dtype)
            # Handles above this chunk belong to later (pipelined)
            # chunks; below it, only the live ensemble's survive.
            store.prune(keep_ids=ids[-1], below=int(ids.max()) + 1)
            coords, log_prob, accepted = jax.device_get(
                (coords, log_prob, accepted)
            )
            self.backend.save_chunk(
                np.asarray(coords),
                np.asarray(log_prob),
                blobs,
                np.asarray(accepted),
                key,
            )
            return
        if jax.process_count() > 1:
            if getattr(self.backend, "shard_per_process", False):
                # Pod-scale path: every process persists only the
                # walker shard its own devices hold — no per-chunk
                # process_allgather (O(global chain) DCN traffic).
                # merge_shards() rebuilds the global file offline.
                if self._param_axis is not None:
                    raise NotImplementedError(
                        "shard_per_process storage with param_axis "
                        "sharding is not supported"
                    )
                (coords, log_prob, blobs, accepted), offset = (
                    _local_walker_block(out)
                )
                self.backend.configure_shard(
                    offset, coords.shape[1]
                )
                self.backend.save_chunk(
                    coords, log_prob, blobs, accepted, key
                )
                return
            # Default: chunk outputs are sharded across hosts; gather
            # to every process, then only process 0 owns the backend
            # write (SURVEY §2: "only process 0 writes global arrays").
            from jax.experimental import multihost_utils

            out = multihost_utils.process_allgather(out, tiled=True)
            if jax.process_index() != 0:
                return
        if getattr(self.backend, "wants_device_arrays", False):
            # DeviceBackend: the chain stays in HBM; no host transfer.
            coords, log_prob, blobs, accepted = out
        else:
            coords, log_prob, blobs, accepted = jax.device_get(out)
        self.backend.save_chunk(coords, log_prob, blobs, accepted, key)
