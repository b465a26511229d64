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


def _named_params_adapter(
    fn: Callable,
    key_map: Dict[str, Union[int, List[int]]],
) -> Callable:
    """Adapt an ``x``-array log-prob to named-parameter calling convention.

    Mirrors ``ensemble.py:174-214, 685-700``: the user function receives a
    dict mapping names to scalars (single index) or vectors (index list).
    Vectorization happens outside, so ``x`` here is a single ``(ndim,)``
    vector.
    """

    import numpy as np

    key_map = {
        key: (np.asarray(val) if isinstance(val, (list, tuple)) else val)
        for key, val in key_map.items()
    }

    def wrapped(x, *args, **kwargs):
        params = {key: x[val] for key, val in key_map.items()}
        return fn(params, *args, **kwargs)

    return wrapped


def canonicalize_output(out):
    """Split a log-prob return value into ``(log_prob, blobs)``.

    The reference peels blobs from per-walker tuple returns with dynamic
    dtype inference (``ensemble.py:498-547``).  Under jit the structure must
    be static: a bare array is a log-prob with no blobs; a tuple/list with
    more than one element is ``(log_prob, *blobs)`` where a single extra
    element becomes the blob itself and several become a tuple-blob.
    """
    if isinstance(out, (tuple, list)):
        if len(out) == 0:
            raise ValueError("log_prob_fn returned an empty tuple")
        if len(out) == 1:
            return out[0], None
        if len(out) == 2:
            return out[0], out[1]
        return out[0], tuple(out[1:])
    return out, None


def wrap_log_prob_fn(
    log_prob_fn: Callable,
    *,
    args=None,
    kwargs=None,
    vectorize: bool = False,
    parameter_names: Optional[Union[Dict[str, Any], List[str]]] = None,
    host_callback: bool = False,
    nwalkers: Optional[int] = None,
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
      ``jax.pure_callback`` (the escape hatch replacing arbitrary Python
      pools; blobs are not supported on this path).
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

        def batched(coords):
            def host_fn(c):
                c = np.asarray(c)
                if vectorize:
                    out = log_prob_fn(c, *args, **kwargs)
                else:
                    out = np.array(
                        [log_prob_fn(x, *args, **kwargs) for x in c]
                    )
                return np.asarray(out, dtype=coords.dtype).reshape(
                    c.shape[0]
                )

            lp = jax.pure_callback(
                host_fn,
                jax.ShapeDtypeStruct((coords.shape[0],), coords.dtype),
                coords,
                vmap_method="sequential",
            )
            return lp, None

        # pure_callback has no JVP: gradient moves check this marker so
        # every Model builder (sampler, kernels, tempering) inherits the
        # clear error without re-plumbing a flag.
        batched._no_grad = True
        return batched

    if vectorize:

        def batched(coords):
            out = fn(coords, *args, **kwargs)
            lp, blobs = canonicalize_output(out)
            return jnp.reshape(lp, (coords.shape[0],)), blobs

        return batched

    def single(x):
        out = fn(x, *args, **kwargs)
        lp, blobs = canonicalize_output(out)
        return jnp.reshape(lp, ()), blobs

    def batched(coords):
        lp, blobs = jax.vmap(single)(coords)
        return lp, blobs

    return batched
