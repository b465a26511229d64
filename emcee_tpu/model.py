"""Log-probability model plumbing.

The reference threads ``(log_prob_fn, compute_log_prob_fn, map_fn, random)``
through every move as a namedtuple (``/root/reference/src/emcee/model.py:8-10``)
and fans per-walker evaluations out over a user-supplied ``pool.map``
(``ensemble.py:486-496``).  On TPU there is no process pool: every
log-probability evaluation is a batched, jit-compiled XLA program over the
local walker shard, so the model reduces to one canonical vectorized callable
plus the mesh axis metadata moves need to issue collectives.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, NamedTuple, Optional, Union

import jax
import jax.numpy as jnp

__all__ = ["Model", "wrap_log_prob_fn"]


class Model(NamedTuple):
    """Everything a move needs to evaluate proposals.

    Fields
    ------
    compute_log_prob:
        Canonical batched log-prob: ``(nwalkers_local, ndim_local) ->
        (log_prob (nwalkers_local,), blobs pytree | None)``.  When
        ``param_axis`` is set the wrapped function already psums partial
        log-probs over the parameter shards.
    axis_name:
        Mesh axis name over which walkers are sharded when the step runs
        inside ``shard_map`` (moves all-gather the complementary ensemble
        half over this axis), or ``None`` on a single device.
    nwalkers:
        Global number of walkers (used for trace-time sanity guards such as
        the ``nwalkers >= 2 * ndim`` red-blue check, which must see the
        global count, not the per-shard count).
    param_axis:
        Mesh axis name over which the *parameter* dimension is sharded
        (the long-ndim / "sequence parallel" analogue for hierarchical
        posteriors), or ``None``.  Per-walker randomness (stretch z,
        partner indices, accept uniforms) must be identical across
        parameter shards — moves fold only the walker-axis index into
        their keys; per-dimension randomness (e.g. Gaussian proposal
        noise) additionally folds the param-axis index via
        :meth:`fold_param`.
    ndim:
        Global parameter dimensionality (``s.shape[1]`` is only the local
        block when ``param_axis`` is set; affine-invariance factors like
        the stretch move's ``(ndim-1) log z`` need the global value).
    """

    compute_log_prob: Callable[[jax.Array], tuple]
    axis_name: Optional[str] = None
    nwalkers: Optional[int] = None
    param_axis: Optional[str] = None
    ndim: Optional[int] = None
    #: With ``param_axis``: the shard-local PARTIAL log-prob (no psum).
    #: Gradient moves differentiate this — the local parameter block's
    #: gradient depends only on the local partial, and differentiating
    #: through the psum would overcount by the axis size (psum's
    #: transpose under ``shard_map(check_vma=False)`` is psum).
    compute_log_prob_partial: Optional[Callable[[jax.Array], tuple]] = None
    #: False when the log-prob is a ``pure_callback`` wrapper
    #: (``host_callback=True``) — it has no JVP, so gradient moves must
    #: raise a clear error instead of a cryptic trace-time failure.
    grad_ok: bool = True

    def log_prob_for_grad(self):
        """The callable gradient-based moves should differentiate."""
        return self.compute_log_prob_partial or self.compute_log_prob

    def global_ndim(self, local_ndim: int) -> float:
        return self.ndim if self.ndim is not None else local_ndim

    def fold_walker(self, key):
        """Per-walker-shard key (identical across parameter shards)."""
        if self.axis_name is not None:
            key = jax.random.fold_in(
                key, jax.lax.axis_index(self.axis_name)
            )
        return key

    def fold_param(self, key):
        """Additionally decorrelate across parameter shards."""
        if self.param_axis is not None:
            key = jax.random.fold_in(
                key, jax.lax.axis_index(self.param_axis)
            )
        return key

    def psum_params(self, x):
        """Sum a per-walker partial reduction over parameter shards."""
        if self.param_axis is not None:
            return jax.lax.psum(x, self.param_axis)
        return x


class _NamedParamsAdapter:
    """Adapt an ``x``-array log-prob to named-parameter calling convention.

    Mirrors ``ensemble.py:174-214, 685-700``: the user function receives a
    dict mapping names to scalars (single index) or vectors (index list).
    Vectorization happens outside, so ``x`` here is a single ``(ndim,)``
    vector.  A class (not a closure) so the host-callback path can ship
    it through a ``multiprocessing.Pool`` — process pools pickle the
    mapped callable, and local closures cannot cross that boundary.
    """

    def __init__(
        self,
        fn: Callable,
        key_map: Dict[str, Union[int, List[int]]],
    ):
        import numpy as np

        self.fn = fn
        self.key_map = {
            key: (
                np.asarray(val) if isinstance(val, (list, tuple)) else val
            )
            for key, val in key_map.items()
        }

    def __call__(self, x, *args, **kwargs):
        params = {key: x[val] for key, val in self.key_map.items()}
        return self.fn(params, *args, **kwargs)


def _named_params_adapter(fn, key_map):
    return _NamedParamsAdapter(fn, key_map)


class _FunctionWrapper:
    """Picklable closure over ``(fn, args, kwargs)``.

    Process pools (``multiprocessing.Pool.map``) pickle the mapped
    callable once per worker; a lambda or local closure cannot cross
    that boundary (the reference hits the same constraint and ships the
    same shape of wrapper, ``ensemble.py:616-632``).
    """

    def __init__(self, f, args, kwargs):
        self.f = f
        self.args = args
        self.kwargs = kwargs

    def __call__(self, x):
        return self.f(x, *self.args, **self.kwargs)


def _normalize_blob_spec(spec):
    """Normalize a host-callback blob declaration.

    Accepts a dtype-like, a ``(shape, dtype)`` pair, or a list of
    either (one entry per blob the host function returns after the
    log-prob).  Returns ``[(per_walker_shape, np.dtype), ...]`` or
    ``None``.  Structure must be declared up front because the host
    boundary is crossed from inside jit, where shapes are static —
    the reference's runtime blob-dtype inference
    (``ensemble.py:498-547``) has no traced equivalent.
    """
    import numpy as np

    if spec is None:
        return None
    if not isinstance(spec, (list, tuple)) or (
        isinstance(spec, tuple)
        and len(spec) == 2
        and isinstance(spec[0], (tuple, list))
    ):
        spec = [spec]
    out = []
    for item in spec:
        if (
            isinstance(item, tuple)
            and len(item) == 2
            and isinstance(item[0], (tuple, list))
        ):
            shape, dt = item
        else:
            shape, dt = (), item
        # Canonicalize (float64 -> float32 without x64): pure_callback
        # rejects 64-bit result declarations under the default x32 mode,
        # and the stored chain is x32 there anyway.
        dt = np.dtype(jax.dtypes.canonicalize_dtype(np.dtype(dt)))
        out.append((tuple(int(d) for d in shape), dt))
    return out


def canonicalize_output(out, reference_layout=False, lead_ndim=0):
    """Split a log-prob return value into ``(log_prob, blobs)``.

    The reference peels blobs from per-walker tuple returns with dynamic
    dtype inference (``ensemble.py:498-547``).  Under jit the structure must
    be static: a bare array is a log-prob with no blobs; a tuple/list with
    more than one element is ``(log_prob, *blobs)`` where a single extra
    element becomes the blob itself and several become a tuple-blob.

    With ``reference_layout=True`` (EnsembleSampler default when no
    ``blobs_dtype`` is declared) the blob additionally follows the
    reference's array-packing semantics (``ensemble.py:514-546``):

    * several extra returns whose values share a shape and promote to a
      common dtype are stacked into ONE array with a new axis (the
      reference's ``np.array(list_of_tuples)``), so
      ``get_blobs()[..., k]`` indexing works;
    * size-1 axes of a single array blob are squeezed (the reference's
      "deal with single blobs properly" squeeze).

    Non-uniform tuples and dict blobs keep the native pytree layout (the
    reference would fall back to object arrays there, which have no
    traced equivalent — the host-fallback path provides those).
    ``lead_ndim`` is the number of leading batch axes to protect from
    the squeeze (0 per-walker under vmap, 1 for vectorized functions).
    """
    if isinstance(out, (tuple, list)):
        if len(out) == 0:
            raise ValueError("log_prob_fn returned an empty tuple")
        if len(out) == 1:
            return out[0], None
        if len(out) == 2:
            blob = out[1]
            if reference_layout and not isinstance(
                blob, (tuple, list, dict)
            ):
                blob = _reference_squeeze(jnp.asarray(blob), lead_ndim)
            return out[0], blob
        if reference_layout and not any(
            isinstance(b, (tuple, list, dict)) for b in out[1:]
        ):
            packed = _try_pack_uniform(out[1:], lead_ndim)
            if packed is not None:
                return out[0], packed
        return out[0], tuple(out[1:])
    return out, None


def _reference_squeeze(blob, lead_ndim):
    """Drop size-1 axes beyond the protected leading batch axes
    (reference ``ensemble.py:541-546``)."""
    axes = tuple(
        i
        for i in range(lead_ndim, blob.ndim)
        if blob.shape[i] == 1
    )
    return jnp.squeeze(blob, axes) if axes else blob


def _try_pack_uniform(extras, lead_ndim):
    """Stack several blob returns into one array when the reference's
    ``np.array(list_of_tuples)`` would produce a regular (non-object)
    array: identical shapes and a common promotable dtype."""
    arrs = [jnp.asarray(b) for b in extras]
    if len({a.shape for a in arrs}) != 1:
        return None
    try:
        dt = jnp.result_type(*arrs)
    except Exception:
        return None
    stacked = jnp.stack(
        [a.astype(dt) for a in arrs], axis=lead_ndim
    )
    return _reference_squeeze(stacked, lead_ndim)


def wrap_log_prob_fn(
    log_prob_fn: Callable,
    *,
    args=None,
    kwargs=None,
    vectorize: bool = False,
    parameter_names: Optional[Union[Dict[str, Any], List[str]]] = None,
    host_callback: bool = False,
    pool: Any = None,
    callback_blobs: Any = None,
    nwalkers: Optional[int] = None,
    reference_blob_layout: bool = False,
) -> Callable:
    """Build the canonical batched log-prob callable.

    Parameters mirror the reference constructor (``ensemble.py:79-98``):

    * ``args``/``kwargs`` are closed over (they live in HBM once — the
      "Brutal." per-call pickling hazard of ``parallel.ipynb`` cannot occur).
    * ``vectorize=False`` (reference default) means ``log_prob_fn`` maps a
      single ``(ndim,)`` vector; we lift it with ``jax.vmap`` instead of
      ``pool.map``.
    * ``vectorize=True`` means it already accepts ``(nwalkers, ndim)``.
    * ``host_callback=True`` wraps a non-JAX-traceable function with
      ``jax.pure_callback``.  With ``pool`` (any object with a
      ``.map(fn, iterable)`` — ``multiprocessing.Pool``, a
      ``concurrent.futures`` executor — or an int worker count for an
      internally-owned thread pool) the per-walker calls fan out in
      parallel on the host, the reference's ``pool.map`` mechanism
      (``ensemble.py:489-496``) for expensive black-box Python
      likelihoods.  ``callback_blobs`` declares the static structure of
      per-walker blobs the host function returns after the log-prob
      (a dtype, a ``(shape, dtype)`` pair, or a list of either) —
      declared up front because shapes under jit are static.
    """
    args = tuple(args) if args is not None else ()
    kwargs = dict(kwargs) if kwargs is not None else {}

    fn = log_prob_fn
    if parameter_names is not None:
        if isinstance(parameter_names, (list, tuple)):
            key_map = {name: i for i, name in enumerate(parameter_names)}
        else:
            key_map = dict(parameter_names)
        fn = _named_params_adapter(fn, key_map)

    if host_callback:
        import numpy as np

        from .hostblobs import OBJECT_BLOBS, HostBlobStore

        # "auto": probe once with real coordinates, prefer declared
        # numeric leaves, fall back to the object store for
        # string/object/ragged blobs.  "auto-reference": probe, but any
        # blobs at all go to the object store with the reference's
        # exact array semantics (used by the sampler's automatic
        # host-fallback for untraceable functions).
        infer_pending = isinstance(callback_blobs, str) and (
            callback_blobs in ("auto", "auto-reference")
        )
        infer_prefer_object = callback_blobs == "auto-reference"
        object_mode = callback_blobs == OBJECT_BLOBS
        blob_store = HostBlobStore() if object_mode else None
        blob_leaves = (
            None
            if (infer_pending or object_mode)
            else _normalize_blob_spec(callback_blobs)
        )
        if object_mode and vectorize:
            raise NotImplementedError(
                "object blobs require per-walker host evaluation; "
                "vectorize=True is not supported with "
                "host_callback_blobs='__object__'"
            )
        call = _FunctionWrapper(fn, args, kwargs)
        owned_executor = None
        if pool is None or vectorize:
            # vectorize=True means the user already batches internally;
            # there is nothing per-walker to fan out.
            map_fn = None
        elif isinstance(pool, (int, np.integer)):
            from concurrent.futures import ThreadPoolExecutor

            # Threads beat processes whenever the likelihood releases
            # the GIL (numpy, scipy, ctypes, IO); for pure-Python
            # compute pass a multiprocessing.Pool instead.
            owned_executor = ThreadPoolExecutor(int(pool))
            map_fn = owned_executor.map
        else:
            map_fn = pool.map

        def check_arity(res):
            # zip() over pre-allocated buffers would silently truncate:
            # a function returning fewer blobs than declared must error,
            # not store uninitialized memory.
            if not isinstance(res, (tuple, list)) or len(res) != 1 + len(
                blob_leaves
            ):
                got = len(res) - 1 if isinstance(res, (tuple, list)) else 0
                raise ValueError(
                    f"log-prob function returned {got} blob value(s) but "
                    f"host_callback_blobs declares {len(blob_leaves)}"
                )

        def _scalar_lp(r):
            # Reference ``_scalar`` tolerance (``ensemble.py:703-713``):
            # accept floats, 0-d arrays, and length-1 arrays.
            v = r[0] if isinstance(r, (tuple, list)) and len(r) > 1 else r
            if isinstance(v, (tuple, list)):
                v = v[0]
            try:
                return float(np.asarray(v).item())
            except (TypeError, ValueError) as e:
                raise ValueError(
                    "log_prob_fn should return scalar"
                ) from e

        def host_fn(c):
            c = np.asarray(c)
            nw = c.shape[0]
            if object_mode:
                if map_fn is not None:
                    results = list(map_fn(call, c))
                else:
                    results = [call(x) for x in c]
                lp = np.asarray(
                    [_scalar_lp(r) for r in results], dtype=c.dtype
                ).reshape(nw)
                entries = [
                    tuple(r[1:])
                    if isinstance(r, (tuple, list)) and len(r) > 1
                    else ()
                    for r in results
                ]
                return lp, blob_store.alloc(entries)
            if vectorize:
                res = call(c)
                if blob_leaves is None:
                    lp = res[0] if isinstance(res, (tuple, list)) else res
                    return np.asarray(lp, dtype=c.dtype).reshape(nw)
                check_arity(res)
                lp = np.asarray(res[0], dtype=c.dtype).reshape(nw)
                leaves = tuple(
                    np.asarray(v, dtype=dt).reshape((nw,) + shape)
                    for v, (shape, dt) in zip(res[1:], blob_leaves)
                )
                return (lp,) + leaves
            if map_fn is not None:
                results = list(map_fn(call, c))
            else:
                results = [call(x) for x in c]
            if blob_leaves is None:
                lp = np.asarray(
                    [
                        r[0] if isinstance(r, (tuple, list)) else r
                        for r in results
                    ],
                    dtype=c.dtype,
                )
                return lp.reshape(nw)
            lp = np.empty(nw, dtype=c.dtype)
            leaves = tuple(
                np.empty((nw,) + shape, dtype=dt)
                for shape, dt in blob_leaves
            )
            for i, r in enumerate(results):
                check_arity(r)
                lp[i] = r[0]
                for leaf, val in zip(leaves, r[1:]):
                    leaf[i] = val
            return (lp,) + leaves

        def _numeric_leaf_spec(extras, lead):
            """Classify probe extras as fixed-shape numeric leaves, or
            None when any is string/object/ragged (→ object store)."""
            specs = []
            for v in extras:
                try:
                    a = np.asarray(v)
                except (ValueError, TypeError):
                    return None
                if a.dtype.kind not in "bifuc":
                    return None
                specs.append(
                    (
                        tuple(a.shape[lead:]),
                        np.dtype(
                            jax.dtypes.canonicalize_dtype(a.dtype)
                        ),
                    )
                )
            return specs

        def infer_blobs(example_coords):
            """Probe the host function once (with real coordinates, before
            the first trace) and adopt whatever blob structure it returns
            — the traced analogue of the reference's runtime blob-dtype
            inference (``ensemble.py:498-547``).  Returns the concrete
            spec for persistence: ``[(shape, dtype), ...]`` numeric
            leaves, the ``OBJECT_BLOBS`` sentinel (host-side object
            store — always under ``"auto-reference"``, and under
            ``"auto"`` when the blobs are string/object/ragged), or
            None."""
            nonlocal blob_leaves, infer_pending, object_mode, blob_store
            if not infer_pending:
                return (
                    OBJECT_BLOBS if object_mode else blob_leaves
                )
            example_coords = np.asarray(example_coords)
            res = call(
                example_coords if vectorize else example_coords[0]
            )
            if isinstance(res, (tuple, list)) and len(res) > 1:
                lead = 1 if vectorize else 0
                specs = (
                    None
                    if infer_prefer_object
                    else _numeric_leaf_spec(res[1:], lead)
                )
                if specs is None:
                    if vectorize:
                        raise NotImplementedError(
                            "object blobs require per-walker host "
                            "evaluation (vectorize=False)"
                        )
                    object_mode = True
                    blob_store = HostBlobStore()
                    blob_leaves = None
                else:
                    blob_leaves = specs
            else:
                blob_leaves = None
            infer_pending = False
            return OBJECT_BLOBS if object_mode else blob_leaves

        def batched(coords):
            if infer_pending:
                raise RuntimeError(
                    "host_callback_blobs='auto' requires one host-side "
                    "probe with real coordinates before tracing; drive "
                    "through the sampler (which probes the initial "
                    "state) or call ._infer_blobs(coords) first"
                )
            nw = coords.shape[0]
            lp_struct = jax.ShapeDtypeStruct((nw,), coords.dtype)
            if object_mode:
                out = jax.pure_callback(
                    host_fn,
                    (
                        lp_struct,
                        jax.ShapeDtypeStruct((nw,), np.int32),
                    ),
                    coords,
                    vmap_method="sequential",
                )
                return out[0], out[1]
            if blob_leaves is None:
                lp = jax.pure_callback(
                    host_fn, lp_struct, coords, vmap_method="sequential"
                )
                return lp, None
            structs = (lp_struct,) + tuple(
                jax.ShapeDtypeStruct((nw,) + shape, dt)
                for shape, dt in blob_leaves
            )
            out = jax.pure_callback(
                host_fn, structs, coords, vmap_method="sequential"
            )
            blobs = out[1] if len(blob_leaves) == 1 else tuple(out[1:])
            return out[0], blobs

        # pure_callback has no JVP: gradient moves check this marker so
        # every Model builder (sampler, kernels, tempering) inherits the
        # clear error without re-plumbing a flag.
        batched._no_grad = True
        batched._infer_blobs = infer_blobs
        # Live accessor (object mode can be adopted by the "auto" probe
        # after this wrapper is built).
        batched._blob_state = lambda: (object_mode, blob_store)
        if owned_executor is not None:
            import weakref

            # Tie the internally-owned executor's lifetime to the wrapper:
            # the handle is otherwise unreachable, and its idle worker
            # threads would accumulate across sampler constructions.
            weakref.finalize(batched, owned_executor.shutdown, wait=False)
        return batched

    if vectorize:

        def batched(coords):
            out = fn(coords, *args, **kwargs)
            lp, blobs = canonicalize_output(
                out, reference_blob_layout, lead_ndim=1
            )
            return jnp.reshape(lp, (coords.shape[0],)), blobs

        return batched

    def single(x):
        out = fn(x, *args, **kwargs)
        lp, blobs = canonicalize_output(
            out, reference_blob_layout, lead_ndim=0
        )
        return jnp.reshape(lp, ()), blobs

    def batched(coords):
        lp, blobs = jax.vmap(single)(coords)
        return lp, blobs

    return batched
