"""Parallel-tempered ensemble sampler.

The reference removed ``PTSampler`` in v3 and shims it to the external
``ptemcee`` package (``/root/reference/src/emcee/ptsampler.py:4-17``;
``HISTORY.rst`` v1.2/v3.0).  BASELINE.json workload 4 requires tempering
first-class, so this is a TPU-native rebuild of the v1.2-era capability:

* a ladder of inverse temperatures ``betas``; temperature ``t`` samples
  ``beta_t * log_like + log_prior``;
* each temperature runs the standard ensemble move machinery, vmapped over
  the temperature axis (one fused XLA program for all rungs);
* after every ``swap_every`` proposals, adjacent rungs exchange walkers with
  probability ``min(1, exp((beta_i - beta_j) * (logL_j - logL_i)))``,
  alternating even/odd pairings (deterministic even-odd, Syed et al. 2019);
* under a mesh, walkers shard over the walker axis exactly like
  :class:`EnsembleSampler` (the temperature axis rides along as a batch
  dim; swaps are shard-local since they pair identical walker slots).

The default ladder is geometric with the Vousden et al. (2016) style
spacing ``ratio = 1 + sqrt(2/ndim)`` appropriate for Gaussian-like targets.
"""

from __future__ import annotations

import time
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import moves as _moves_mod
from ..driver import (
    blobs_struct_of,
    cast_io,
    chunk_schedule,
    grow_blobs_template,
    kick_async_fetch,
    parse_io_dtype,
    parse_moves,
    shim_thin,
)
from ..model import Model, wrap_log_prob_fn
from ..ops import autocorr
from ..pbar import get_progress_bar
from ..state import State, coerce_random_state, walkers_independent
from ..utils import defer_interrupts

__all__ = ["PTSampler", "PTState", "default_beta_ladder"]


def default_beta_ladder(ntemps, ndim, max_temp=None):
    """Geometric inverse-temperature ladder.

    Spacing ``1 + sqrt(2/ndim)`` per rung (the optimal adjacent-temperature
    ratio for a d-dimensional Gaussian, Vousden et al. 2016); with
    ``max_temp`` given, the ladder spans [1, max_temp] geometrically, and
    the top rung is always included.
    """
    if max_temp is None:
        ratio = 1.0 + np.sqrt(2.0 / ndim)
        betas = ratio ** (-np.arange(ntemps, dtype=np.float64))
    else:
        betas = np.exp(
            np.linspace(0.0, -np.log(max_temp), ntemps)
        )
    return betas


class PTState(NamedTuple):
    """Snapshot of the tempered ensemble.

    Leading axes: ``(ntemps, nwalkers, ...)``.
    """

    coords: jax.Array  # (T, nw, nd)
    log_like: jax.Array  # (T, nw)
    log_prior: jax.Array  # (T, nw)
    random_state: Optional[jax.Array] = None
    #: user blobs returned by ``log_like_fn`` after the likelihood
    #: (pytree of (T, nw, ...) leaves), or None.
    blobs: Optional[Any] = None

    @property
    def ntemps(self):
        return self.coords.shape[0]

    @property
    def nwalkers(self):
        return self.coords.shape[1]

    @property
    def ndim(self):
        return self.coords.shape[2]


class PTSampler:
    """Parallel-tempered ensemble MCMC sampler.

    Args:
        ntemps: number of temperature rungs.
        nwalkers: walkers per rung.
        ndim: parameter dimensionality.
        log_like_fn: log likelihood, single ``(ndim,)`` vector unless
            ``vectorize=True`` (then ``(n, ndim) -> (n,)``).
        log_prior_fn: log prior, same convention.
        betas: explicit inverse-temperature ladder (default: geometric, see
            :func:`default_beta_ladder`).
        moves: move / weighted move list, as for :class:`EnsembleSampler`.
        swap_every: proposals between swap attempts (default 1).
        seed: PRNG seed or key.
        mesh: optional mesh; walkers shard over ``walker_axis``.
        parameter_names: list of names or dict name -> index/indices; the
            log-like and log-prior then receive dicts (same convention as
            :class:`EnsembleSampler`, reference ``ensemble.py:174-214``).
        host_callback: wrap non-traceable ``log_like_fn`` /
            ``log_prior_fn`` with ``jax.pure_callback``; gradient moves
            are rejected on this path.
        pool: host-side fan-out for per-walker calls with
            ``host_callback=True`` (``.map`` object or int worker
            count); applies to the likelihood only — the prior
            evaluates inline (per-call pool dispatch would cost more
            than a typical prior).  Ignored with a warning otherwise.
            Dropped on pickling.
        host_callback_blobs: blob structure the host-callback
            ``log_like_fn`` returns after the likelihood (a dtype, a
            ``(shape, dtype)`` pair, a list of either, or ``"auto"`` to
            infer by probing with the initial coordinates); blobs ride
            the likelihood only.
        mixture_block: with a move mixture, draw the move once per block
            of this many kept steps instead of once per proposal —
            blocks run as pure-move scans with no per-proposal
            ``lax.switch`` (same knob as :class:`EnsembleSampler`).
    """

    def __init__(
        self,
        ntemps,
        nwalkers,
        ndim,
        log_like_fn,
        log_prior_fn,
        betas=None,
        moves=None,
        args=None,
        kwargs=None,
        vectorize=False,
        swap_every=1,
        adaptive=False,
        adaptation_lag=10_000,
        adaptation_time=100,
        seed=0,
        backend=None,
        mesh: Optional[Mesh] = None,
        walker_axis: str = "walkers",
        temp_axis: Optional[str] = None,
        param_axis: Optional[str] = None,
        io_chunk_bytes: int = 1 << 27,
        scan_unroll: int = 4,
        io_dtype=None,
        parameter_names=None,
        host_callback: bool = False,
        pool=None,
        host_callback_blobs=None,
        mixture_block: int = 1,
    ):
        self.nwalkers = int(nwalkers)
        self.ndim = int(ndim)
        if betas is None:
            betas = default_beta_ladder(ntemps, ndim)
        self.betas = np.asarray(betas, dtype=np.float64)
        self.ntemps = len(self.betas)
        assert self.ntemps == ntemps
        self.swap_every = int(swap_every)
        # Vousden et al. (2016) diminishing ladder adaptation.
        self.adaptive = bool(adaptive)
        self.adaptation_lag = float(adaptation_lag)
        self.adaptation_time = float(adaptation_time)

        self._moves, self._weights = parse_moves(
            moves, _moves_mod.StretchMove
        )
        self._mixture_block = int(mixture_block)
        if self._mixture_block < 1:
            raise ValueError("mixture_block must be >= 1")

        self.mesh = mesh
        self.walker_axis = walker_axis
        self.temp_axis = temp_axis
        self.param_axis = param_axis
        self._axis_name = walker_axis if mesh is not None else None
        self._temp_axis = (
            temp_axis if (mesh is not None and temp_axis) else None
        )
        self._param_axis = (
            param_axis if (mesh is not None and param_axis) else None
        )
        if temp_axis is not None and mesh is None:
            raise ValueError("temp_axis requires a mesh")
        if param_axis is not None and mesh is None:
            raise ValueError("param_axis requires a mesh")
        if self._param_axis is not None:
            p_shards = mesh.shape[self._param_axis]
            if self.ndim % p_shards:
                raise ValueError(
                    f"ndim ({self.ndim}) must divide by the mesh "
                    f"'{self._param_axis}' axis size ({p_shards})"
                )
        if mesh is not None and self.nwalkers % mesh.shape[walker_axis]:
            raise ValueError(
                f"nwalkers ({self.nwalkers}) must divide by the mesh "
                f"'{walker_axis}' axis size ({mesh.shape[walker_axis]})"
            )
        if self._temp_axis is not None:
            tshards = mesh.shape[self._temp_axis]
            if self.ntemps % tshards:
                raise ValueError(
                    f"ntemps ({self.ntemps}) must divide by the mesh "
                    f"'{self._temp_axis}' axis size ({tshards})"
                )
            t_local = self.ntemps // tshards
            if tshards > 1 and t_local % 2:
                raise ValueError(
                    "temperature sharding needs an even number of rungs "
                    f"per shard (got {t_local}); shard-internal and "
                    "boundary swap parities must be static"
                )

        if isinstance(seed, (int, np.integer)):
            self._key = jax.random.key(seed)
        else:
            self._key = seed

        import warnings

        if pool is not None and not host_callback:
            warnings.warn(
                "'pool' is ignored without host_callback=True: on-device "
                "evaluation is already batched (see EnsembleSampler)",
                stacklevel=2,
            )
            pool = None
        self.pool = pool  # never pickled (reference parity)
        if host_callback_blobs is not None and not host_callback:
            raise ValueError(
                "host_callback_blobs requires host_callback=True; "
                "JAX-traceable log-likes return blobs directly"
            )
        self._log_like_fn = log_like_fn
        self._log_prior_fn = log_prior_fn
        self._lp_settings = dict(
            vectorize=vectorize,
            parameter_names=parameter_names,
            host_callback=host_callback,
        )
        # Blobs ride the likelihood only (the prior is a density, not a
        # data product); "auto" probes the function with the initial
        # coordinates to infer the structure (see EnsembleSampler).
        self._like_settings = dict(
            args=args,
            kwargs=kwargs,
            callback_blobs=host_callback_blobs,
            **self._lp_settings,
        )
        self._wrap_fns()
        self._io_chunk_bytes = int(io_chunk_bytes)
        # Per-scan-iteration runtime overhead (~55us on this v5e)
        # dominates small tempered ensembles; unrolling amortizes it,
        # exactly as in EnsembleSampler.
        self._scan_unroll = int(scan_unroll)
        # Reduced-precision chain storage (see EnsembleSampler.io_dtype):
        # stored coords are cast in-jit before leaving the device.  The
        # tempered chain is ntemps x larger than a flat one, so this is
        # where compressed streaming pays the most.  log_like/log_prior
        # stay full precision (magnitude can exceed float16 range).
        self._io_dtype = parse_io_dtype(io_dtype)

        # Host-side storage with crash-resume, like EnsembleSampler.
        from ..backends.pt import PTBackend

        self.backend = PTBackend() if backend is None else backend
        self._previous_state = None
        if self.backend.initialized:
            if self.backend.shape != (
                self.ntemps,
                self.nwalkers,
                self.ndim,
            ):
                raise ValueError(
                    "the shape of the backend is incompatible with the "
                    f"sampler; expected "
                    f"{(self.ntemps, self.nwalkers, self.ndim)}, got "
                    f"{self.backend.shape}"
                )
            if self.backend.iteration > 0:
                self._previous_state = self.backend.get_last_sample()
                # Resume the (possibly adapted) ladder the walkers were
                # actually sampled with, not the constructor default —
                # otherwise an adaptive=True run silently reverts.
                saved = getattr(self.backend, "betas", None)
                if saved is not None:
                    saved = np.asarray(saved, dtype=np.float64)
                    if saved.shape == self.betas.shape and np.any(
                        saved != 0.0
                    ):
                        self.betas = saved
        else:
            self.backend.reset(self.ntemps, self.nwalkers, self.ndim)
        self._base_swaps_accepted = np.asarray(
            self.backend.swaps_accepted, dtype=np.int64
        )
        self._base_swaps_proposed = np.asarray(
            self.backend.swaps_proposed, dtype=np.int64
        )
        self._run_cache = {}

    def _wrap_fns(self):
        # The pool fans out the (expensive) likelihood only: a typical
        # prior is microseconds of host work, and per-call pool dispatch
        # would cost more than it saves.  wrap_log_prob_fn owns and
        # reclaims the executor when given an int worker count.
        self._log_like = wrap_log_prob_fn(
            self._log_like_fn, pool=self.pool, **self._like_settings
        )
        self._log_prior = wrap_log_prob_fn(
            self._log_prior_fn, pool=None, **self._lp_settings
        )

    def __getstate__(self):
        # Jitted chunk runners, wrapped closures, and pools don't pickle;
        # they rebuild after unpickling (same contract as EnsembleSampler).
        d = self.__dict__.copy()
        d["_run_cache"] = {}
        d["_log_like"] = None
        d["_log_prior"] = None
        d["pool"] = None
        return d

    def __setstate__(self, d):
        self.__dict__.update(d)
        self._wrap_fns()

    def reset(self):
        # Move carries (per-rung tuned scales etc.) survive reset, like
        # the reference's stateful move objects (see EnsembleSampler.reset).
        self.backend.reset(self.ntemps, self.nwalkers, self.ndim)
        self._previous_state = None
        self._base_swaps_accepted = np.zeros(
            max(self.ntemps - 1, 1), dtype=np.int64
        )
        self._base_swaps_proposed = np.zeros(
            max(self.ntemps - 1, 1), dtype=np.int64
        )

    @property
    def iteration(self):
        return self.backend.iteration

    @property
    def accepted(self):
        return self.backend.accepted

    @property
    def swaps_accepted(self):
        return self.backend.swaps_accepted

    @property
    def swaps_proposed(self):
        return self.backend.swaps_proposed

    # ------------------------------------------------------------------
    def _tempered_model(self, beta):
        """Model whose log-prob is beta*logL + logP.

        The move-level blobs are ``(logL, logP, user_blobs)`` — the
        first two are the tempered bookkeeping, the third carries any
        extra values ``log_like_fn`` returns (reference blob semantics;
        ``log_prior_fn`` blobs are ignored).  Moves treat the tuple as
        an opaque pytree, so accepted proposals carry all three along.
        """

        paxis = self._param_axis

        def compute(q):
            ll, ublobs = self._log_like(q)
            lpr, _ = self._log_prior(q)
            if paxis is not None:
                if ublobs is not None:
                    raise NotImplementedError(
                        "blobs are not supported with parameter-axis "
                        "sharding"
                    )
                # Long-ndim mode: the user functions return shard-local
                # PARTIAL sums over their parameter block; psum
                # completes them BEFORE the tempering/masking algebra
                # (a bound violation in any block must mask globally).
                ll = jax.lax.psum(ll, paxis)
                lpr = jax.lax.psum(lpr, paxis)
            finite = lpr > -jnp.inf
            ll = jnp.where(finite, ll, 0.0)
            lp = jnp.where(finite, beta * ll + lpr, -jnp.inf)
            return lp, (ll, lpr, ublobs)

        partial = None
        if paxis is not None:

            def partial(q):  # noqa: F811 - the param-sharded branch
                # Gradient moves differentiate the LOCAL tempered
                # partial (d(global)/d(local block) — differentiating
                # through the psum would overcount; see model.py).
                ll, _ = self._log_like(q)
                lpr, _ = self._log_prior(q)
                return beta * ll + lpr, None

        return Model(
            compute_log_prob=compute,
            axis_name=self._axis_name,
            nwalkers=self.nwalkers,
            param_axis=paxis,
            ndim=self.ndim,
            compute_log_prob_partial=partial,
            # pure_callback has no JVP — gradient moves must see the
            # marker and raise their clear error (see model.py).
            grad_ok=not (
                getattr(self._log_like, "_no_grad", False)
                or getattr(self._log_prior, "_no_grad", False)
            ),
        )

    def _init_carries(self):
        base = tuple(
            m.init_carry(self.nwalkers, self.ndim) for m in self._moves
        )
        # One carry per temperature (vmapped axis 0).
        return jax.tree_util.tree_map(
            lambda c: jnp.broadcast_to(c, (self.ntemps,) + c.shape)
            if hasattr(c, "shape")
            else c,
            base,
        )

    def _move_step(
        self, key, coords, log_like, log_prior, blobs, betas, carries,
        tune=False, move_index=None,
    ):
        """One ensemble-move proposal at every (local) temperature.

        Under temperature sharding ``coords`` holds this shard's rung
        block; per-rung keys come from one global split sliced by the
        shard index so every rung keeps its own stream regardless of the
        mesh shape.  ``betas`` is already the local slice.

        With ``move_index`` (a Python int) the move is fixed — no
        categorical draw, no ``lax.switch`` — the building block of the
        ``mixture_block`` execution mode.  The key splits stay identical
        to the mixture path so streams match across execution modes
        where possible.
        """
        n_moves = len(self._moves)
        t_local = coords.shape[0]
        k_move, k_prop = jax.random.split(key)
        temp_keys = jax.random.split(k_prop, self.ntemps)
        if self._temp_axis is not None:
            tidx = jax.lax.axis_index(self._temp_axis)
            temp_keys = jax.lax.dynamic_slice_in_dim(
                temp_keys, tidx * t_local, t_local
            )

        def per_temp(
            key_t, coords_t, ll_t, lpr_t, blobs_t, beta_t, carries_t, idx
        ):
            model = self._tempered_model(beta_t)
            lp_t = jnp.where(
                lpr_t > -jnp.inf, beta_t * ll_t + lpr_t, -jnp.inf
            )
            st = State(
                coords=coords_t, log_prob=lp_t,
                blobs=(ll_t, lpr_t, blobs_t),
            )

            if n_moves == 1 or move_index is not None:
                mi = 0 if move_index is None else int(move_index)
                mv = self._moves[mi]
                if getattr(mv, "wants_tune_flag", False):
                    new_st, acc, c = mv.propose(
                        key_t, st, model, carries_t[mi], tune=tune
                    )
                else:
                    new_st, acc, c = mv.propose(
                        key_t, st, model, carries_t[mi]
                    )
                if tune:
                    c = mv.tune(c, new_st, acc, model)
                carries_t = carries_t[:mi] + (c,) + carries_t[mi + 1 :]
            else:

                def make_branch(i):
                    def branch(operand):
                        k, s, cs = operand
                        mv = self._moves[i]
                        if getattr(mv, "wants_tune_flag", False):
                            ns, acc, c = mv.propose(
                                k, s, model, cs[i], tune=tune
                            )
                        else:
                            ns, acc, c = mv.propose(k, s, model, cs[i])
                        if tune:
                            c = mv.tune(c, ns, acc, model)
                        cs = cs[:i] + (c,) + cs[i + 1 :]
                        return ns, acc, cs

                    return branch

                new_st, acc, carries_t = jax.lax.switch(
                    idx,
                    [make_branch(i) for i in range(n_moves)],
                    (key_t, st, carries_t),
                )
            new_ll, new_lpr, new_blobs = new_st.blobs
            return (
                new_st.coords, new_ll, new_lpr, new_blobs, acc, carries_t
            )

        if n_moves > 1:
            idx = jax.random.choice(
                k_move, n_moves, p=jnp.asarray(self._weights)
            )
        else:
            idx = jnp.zeros((), dtype=jnp.int32)
        idxs = jnp.broadcast_to(idx, (t_local,))
        return jax.vmap(per_temp)(
            temp_keys, coords, log_like, log_prior, blobs, betas, carries,
            idxs,
        )

    def _swap_step(self, key, data, betas, parity):
        """Even/odd adjacent-rung exchange; returns swapped data + stats.

        ``data`` is the walker-state pytree ``(coords, log_like,
        log_prior, blobs)`` (blobs may be None) — every leaf has leading
        ``(T, nw)`` axes and exchanges as one unit, so accepted swaps
        carry the walkers' blobs with them.  For pair (i, i+1): accept
        with log-prob ``(beta_i - beta_{i+1}) * (logL_{i+1} - logL_i)``.
        """
        if self._axis_name is not None:
            # Under walker sharding each shard holds different walkers, so
            # the (replicated) key must be decorrelated per shard or every
            # shard reuses identical accept uniforms (mirrors
            # _swap_step_sharded).
            key = jax.random.fold_in(
                key, jax.lax.axis_index(self._axis_name)
            )
        log_like = data[1]
        T = self.ntemps
        pair_lo = np.arange(parity, T - 1, 2)
        if len(pair_lo) == 0:
            zeros = jnp.zeros((0, log_like.shape[1]), dtype=bool)
            return data, zeros, pair_lo
        lo = jnp.asarray(pair_lo)
        hi = lo + 1
        dbeta = betas[lo] - betas[hi]  # (P,)
        dll = log_like[hi] - log_like[lo]  # (P, nw)
        u = jax.random.uniform(key, dll.shape, dtype=dll.dtype)
        acc = jnp.log(u) < dbeta[:, None] * dll  # (P, nw)

        def exch(arr):
            a_lo, a_hi = arr[lo], arr[hi]
            m = acc.reshape(acc.shape + (1,) * (arr.ndim - 2))
            new_lo = jnp.where(m, a_hi, a_lo)
            new_hi = jnp.where(m, a_lo, a_hi)
            return arr.at[lo].set(new_lo).at[hi].set(new_hi)

        return jax.tree_util.tree_map(exch, data), acc, pair_lo

    def _swap_step_sharded(self, key, data, betas, parity):
        """Adjacent-rung exchange with the temperature axis sharded.

        Shard-internal pairs swap locally; the pair straddling each shard
        boundary exchanges rung data with the neighbor shard via
        ``jax.lax.ppermute`` over ICI.  Requiring an even number of rungs
        per shard makes pair parities static: even-parity pairs are always
        internal, the boundary pair is always odd-parity, and both sides
        of a boundary derive the same accept uniforms from a key folded
        with the global boundary id — so the two shards reach identical
        decisions with one ppermute each and no extra synchronization.
        """
        taxis = self._temp_axis
        waxis = self._axis_name
        ll = data[1]
        T = self.ntemps
        t_loc = ll.shape[0]
        S = T // t_loc
        tidx = jax.lax.axis_index(taxis)
        if waxis is not None:
            key = jax.random.fold_in(
                key, jax.lax.axis_index(waxis)
            )
        nw = ll.shape[1]
        counts = jnp.zeros((t_loc, nw), dtype=jnp.int32)

        # Shard-internal pairs (static local indices thanks to even t_loc).
        lo_list = list(range(parity, t_loc - 1, 2))
        if lo_list:
            lo = jnp.asarray(lo_list)
            hi = lo + 1
            g_lo = tidx * t_loc + lo
            dbeta = betas[g_lo] - betas[g_lo + 1]
            dll = ll[hi] - ll[lo]
            k_int = jax.random.fold_in(key, tidx)
            u = jax.random.uniform(k_int, dll.shape, dtype=dll.dtype)
            acc = jnp.log(u) < dbeta[:, None] * dll

            def exch(arr):
                m = acc.reshape(acc.shape + (1,) * (arr.ndim - 2))
                new_lo = jnp.where(m, arr[hi], arr[lo])
                new_hi = jnp.where(m, arr[lo], arr[hi])
                return arr.at[lo].set(new_lo).at[hi].set(new_hi)

            data = jax.tree_util.tree_map(exch, data)
            ll = data[1]
            counts = counts.at[lo].add(acc.astype(jnp.int32))

        if S > 1 and parity == (t_loc - 1) % 2:
            perm_from_right = [(i, (i - 1) % S) for i in range(S)]
            perm_from_left = [(i, (i + 1) % S) for i in range(S)]
            # Exchange whole rung rows (incl. blob leaves) with the
            # neighbor shards over ICI.
            nb_first = jax.tree_util.tree_map(
                lambda x: jax.lax.ppermute(x[0], taxis, perm_from_right),
                data,
            )
            nb_last = jax.tree_util.tree_map(
                lambda x: jax.lax.ppermute(
                    x[t_loc - 1], taxis, perm_from_left
                ),
                data,
            )
            # Right boundary (pair id = tidx): my last rung <-> their first.
            g_last = tidx * t_loc + t_loc - 1
            dbeta_r = betas[g_last] - betas[jnp.minimum(g_last + 1, T - 1)]
            u_r = jax.random.uniform(
                jax.random.fold_in(key, 10_000 + tidx), (nw,),
                dtype=ll.dtype,
            )
            acc_r = (
                jnp.log(u_r) < dbeta_r * (nb_first[1] - ll[t_loc - 1])
            ) & (tidx < S - 1)
            # Left boundary (pair id = tidx - 1): their last <-> my first.
            g_first = tidx * t_loc
            dbeta_l = betas[jnp.maximum(g_first - 1, 0)] - betas[g_first]
            u_l = jax.random.uniform(
                jax.random.fold_in(key, 10_000 + tidx - 1), (nw,),
                dtype=ll.dtype,
            )
            acc_l = (
                jnp.log(u_l) < dbeta_l * (data[1][0] - nb_last[1])
            ) & (tidx > 0)

            def boundary_update(arr, nb_f, nb_l):
                m_r = acc_r.reshape(acc_r.shape + (1,) * (arr.ndim - 2))
                m_l = acc_l.reshape(acc_l.shape + (1,) * (arr.ndim - 2))
                arr = arr.at[t_loc - 1].set(
                    jnp.where(m_r, nb_f, arr[t_loc - 1])
                )
                return arr.at[0].set(jnp.where(m_l, nb_l, arr[0]))

            data = jax.tree_util.tree_map(
                boundary_update, data, nb_first, nb_last
            )
            counts = counts.at[t_loc - 1].add(acc_r.astype(jnp.int32))

        return data, counts

    def _cast_io(self, x):
        return cast_io(x, self._io_dtype)

    def _grow_blobs_template(self, blobs):
        return grow_blobs_template(blobs, self._io_dtype)

    def _blob_partition_tree(self, blobs_struct, spec):
        if blobs_struct is None:
            return None
        return jax.tree_util.tree_map(
            lambda _: spec, blobs_struct.example
        )

    def _build_chunk(self, nkeep, thin_by, store, tune=False,
                     blobs_struct=None):
        cache_key = (nkeep, thin_by, store, tune, blobs_struct)
        fn = self._run_cache.get(cache_key)
        if fn is not None:
            return fn

        swap_every = self.swap_every

        def make_one(move_index):
            def one(carry, step_i):
                # step_i is the GLOBAL proposal index (offset threaded in via
                # kept0), so the even/odd swap parity and the swap_every phase
                # stay continuous across chunks and resumed runs — matching
                # the host-side per-pair attempt accounting in run_mcmc.
                state, carries, swap_acc_tot, betas = carry
                key, k_move, k_swap = jax.random.split(state.random_state, 3)
                t_loc = state.coords.shape[0]
                if self._temp_axis is not None:
                    tidx = jax.lax.axis_index(self._temp_axis)
                    betas_local = jax.lax.dynamic_slice_in_dim(
                        betas, tidx * t_loc, t_loc
                    )
                else:
                    betas_local = betas
                coords, ll, lpr, blobs, acc, carries = self._move_step(
                    k_move,
                    state.coords,
                    state.log_like,
                    state.log_prior,
                    state.blobs,
                    betas_local,
                    carries,
                    tune=tune,
                    move_index=move_index,
                )
                data = (coords, ll, lpr, blobs)
                parity = step_i % 2

                def do_swap(args):
                    data, swap_acc_tot = args

                    # Alternate even/odd pairings by step parity; both
                    # parities compiled, selected by lax.cond.
                    def swap_with(par):
                        def branch(_):
                            if self._temp_axis is not None:
                                return self._swap_step_sharded(
                                    k_swap, data, betas, par
                                )
                            d, a, lo = self._swap_step(
                                k_swap, data, betas, par
                            )
                            return d, self._scatter_swap_counts(a, par)

                        return branch

                    d, counts = jax.lax.cond(
                        parity == 0, swap_with(0), swap_with(1), None
                    )
                    return d, swap_acc_tot + counts

                if swap_every > 0:
                    do = (step_i % swap_every) == (swap_every - 1)
                    data, swap_acc_tot = jax.lax.cond(
                        do,
                        do_swap,
                        lambda args: args,
                        (data, swap_acc_tot),
                    )
                coords, ll, lpr, blobs = data

                state = PTState(
                    coords=coords,
                    log_like=ll,
                    log_prior=lpr,
                    random_state=key,
                    blobs=blobs,
                )
                return (state, carries, swap_acc_tot, betas), acc

            return one

        def make_kept(one):
            def kept(carry, step_i):
                base = step_i * thin_by
                (state, carries, swp, betas), accs = jax.lax.scan(
                    one,
                    carry,
                    base + jnp.arange(thin_by),
                    unroll=min(self._scan_unroll, thin_by),
                )
                if store:
                    coords_out = state.coords
                    if self._io_dtype is not None:
                        coords_out = coords_out.astype(self._io_dtype)
                    out = (
                        coords_out,
                        state.log_like,
                        state.log_prior,
                        jax.tree_util.tree_map(
                            self._cast_io, state.blobs
                        ),
                        accs[-1],
                    )
                else:
                    out = None
                return (state, carries, swp, betas), out

            return kept

        n_moves = len(self._moves)
        blk = self._mixture_block
        if n_moves > 1 and blk > 1 and nkeep % blk == 0:
            # Blocked mixture: draw the move once per block of `blk`
            # kept steps; each block runs a pure-move scan with no
            # per-proposal lax.switch (same validity argument as
            # EnsembleSampler's mixture_block — a state-independent
            # schedule of pi-invariant kernels).
            kepts = [make_kept(make_one(i)) for i in range(n_moves)]
            weights = jnp.asarray(self._weights)

            def block(carry, block0):
                state, carries, swp, betas = carry
                key, k_sel = jax.random.split(state.random_state)
                state = state._replace(random_state=key)
                idx = jax.random.choice(k_sel, n_moves, p=weights)

                def make_branch(i):
                    def branch(c):
                        (st, cs, sw, b), outs = jax.lax.scan(
                            kepts[i],
                            c,
                            block0 + jnp.arange(blk),
                            unroll=min(self._scan_unroll, blk),
                        )
                        return st, cs, sw, b, outs

                    return branch

                st, cs, sw, b, outs = jax.lax.switch(
                    idx,
                    [make_branch(i) for i in range(n_moves)],
                    (state, carries, swp, betas),
                )
                return (st, cs, sw, b), outs

            def chunk(state, carries, swap_acc_tot, betas, kept0):
                (state, carries, swp, betas), outs = jax.lax.scan(
                    block,
                    (state, carries, swap_acc_tot, betas),
                    kept0 + blk * jnp.arange(nkeep // blk),
                )
                if store:
                    outs = jax.tree_util.tree_map(
                        lambda o: o.reshape((nkeep,) + o.shape[2:]), outs
                    )
                return state, carries, swp, outs

        else:
            kept = make_kept(make_one(None))

            def chunk(state, carries, swap_acc_tot, betas, kept0):
                (state, carries, swp, betas), outs = jax.lax.scan(
                    kept,
                    (state, carries, swap_acc_tot, betas),
                    kept0 + jnp.arange(nkeep),
                    unroll=min(self._scan_unroll, nkeep),
                )
                return state, carries, swp, outs

        if self.mesh is not None:
            ax = self.walker_axis
            tx = self._temp_axis  # None -> replicated temperature axis
            px = self._param_axis  # None -> replicated parameter axis
            state_spec = PTState(
                coords=P(tx, ax, px),
                log_like=P(tx, ax),
                log_prior=P(tx, ax),
                random_state=P(),
                blobs=self._blob_partition_tree(blobs_struct, P(tx, ax)),
            )
            carries_spec = jax.tree_util.tree_map(
                lambda _: P(tx), self._init_carries()
            )
            swap_spec = P(tx, ax)
            if store:
                out_spec = (
                    P(None, tx, ax, px),
                    P(None, tx, ax),
                    P(None, tx, ax),
                    self._blob_partition_tree(
                        blobs_struct, P(None, tx, ax)
                    ),
                    P(None, tx, ax),
                )
            else:
                out_spec = None
            chunk = _shard_map(
                chunk,
                mesh=self.mesh,
                in_specs=(state_spec, carries_spec, swap_spec, P(), P()),
                out_specs=(state_spec, carries_spec, swap_spec, out_spec),
                check_vma=False,
            )

        fn = jax.jit(chunk)
        self._run_cache[cache_key] = fn
        return fn

    def _scatter_swap_counts(self, acc, parity):
        """(P, nw) pair acceptances -> (T, nw) counts at pair rows.

        Row p counts swaps of pair (p, p+1); the final row is unused
        padding so the dense and temperature-sharded layouts agree
        (sharded shards each hold ``t_local`` rows whose concatenation is
        exactly this (T, nw) table).
        """
        T = self.ntemps
        counts = jnp.zeros((T, acc.shape[1]), dtype=jnp.int32)
        lo = jnp.arange(parity, T - 1, 2)
        if lo.shape[0] == 0:
            return counts
        return counts.at[lo].add(acc.astype(jnp.int32))

    # ------------------------------------------------------------------
    def _prepare_state(
        self, initial_state, skip_check=False, trusted=False
    ):
        # trusted=True: the sampler's own resume anchor — produced by
        # the validated run loop — skips the per-rung
        # walkers_independent fetches (T host roundtrips per
        # run_mcmc(None) call; see EnsembleSampler._prepare_state).
        if isinstance(initial_state, PTState):
            state = initial_state
        else:
            coords = jnp.asarray(initial_state)
            if coords.shape != (self.ntemps, self.nwalkers, self.ndim):
                raise ValueError(
                    f"incompatible input dimensions {coords.shape}; "
                    f"expected {(self.ntemps, self.nwalkers, self.ndim)}"
                )
            state = PTState(coords=coords, log_like=None, log_prior=None)
        if (
            self._io_dtype is not None
            and state.coords.dtype == self._io_dtype
            and self._io_dtype.itemsize < 4
        ):
            # Resuming from a reduced-precision store: upcast (to
            # float64 under x64) and drop the cached likelihoods (they
            # belong to the unrounded coords; see
            # EnsembleSampler._prepare_state).
            state = state._replace(
                coords=jnp.asarray(
                    state.coords,
                    dtype=jax.dtypes.canonicalize_dtype(jnp.float64),
                ),
                log_like=None,
                log_prior=None,
                blobs=None,
            )
        if not skip_check and not trusted:
            for t in range(self.ntemps):
                if not walkers_independent(state.coords[t]):
                    raise ValueError(
                        f"Initial state for temperature {t} has a large "
                        "condition number"
                    )
        key = coerce_random_state(state.random_state)
        if key is None:
            self._key, key = jax.random.split(self._key)
        state = state._replace(random_state=key)
        if self._like_settings.get("callback_blobs") == "auto":
            # Resolve the blob structure with one host-side probe before
            # anything traces; persist the concrete spec for rebuilds.
            self._like_settings["callback_blobs"] = (
                self._log_like._infer_blobs(
                    np.asarray(state.coords).reshape(-1, self.ndim)
                )
            )
            if self._like_settings["callback_blobs"] == "__object__":
                raise NotImplementedError(
                    "string/object/ragged blobs are not supported on "
                    "PTSampler (swaps would have to permute host-side "
                    "state); declare numeric host_callback_blobs"
                )
        need_eval = state.log_like is None
        if not need_eval and state.blobs is not None:
            # Resumed blob-ful state + a likelihood that no longer
            # returns blobs would freeze stale blob values into every
            # stored row (see EnsembleSampler._prepare_state).  Only
            # shapes are needed — a concrete reshape of resumed device
            # coords would be an eager device op (remote-compile cost on
            # the tunneled runtime).
            _, bs = jax.eval_shape(
                self._log_like,
                jax.ShapeDtypeStruct(
                    (self.ntemps * self.nwalkers, self.ndim),
                    state.coords.dtype,
                ),
            )
            if bs is None:
                raise ValueError(
                    "inconsistent use of blobs: the resumed state "
                    "carries blobs but the log-likelihood returns none"
                )
        if not need_eval and state.blobs is None:
            # The model may produce blobs the resumed state lacks (e.g.
            # a backend that does not store them): recompute so the blob
            # structure is present from step one — a missing old-blob
            # tree would let rejected walkers adopt rejected proposals'
            # blobs in the accept select.
            _, bs = jax.eval_shape(
                self._log_like,
                jax.ShapeDtypeStruct(
                    (self.ntemps * self.nwalkers, self.ndim),
                    state.coords.dtype,
                ),
            )
            need_eval = bs is not None
        if need_eval:
            flat = state.coords.reshape(-1, self.ndim)
            ll, ublobs = jax.jit(self._log_like)(flat)
            lpr, _ = jax.jit(self._log_prior)(flat)
            ll = ll.reshape(self.ntemps, self.nwalkers)
            lpr = lpr.reshape(self.ntemps, self.nwalkers)
            if ublobs is not None:
                ublobs = jax.tree_util.tree_map(
                    lambda b: b.reshape(
                        (self.ntemps, self.nwalkers) + b.shape[1:]
                    ),
                    ublobs,
                )
            if np.any(np.isnan(np.asarray(ll))) or np.any(
                np.isnan(np.asarray(lpr))
            ):
                raise ValueError("The initial log-likelihood was NaN")
            state = state._replace(
                log_like=ll, log_prior=lpr, blobs=ublobs
            )
        if self.mesh is not None:
            ax = self.walker_axis
            tx = self._temp_axis
            blob_sh = None
            if state.blobs is not None:
                blob_sh = jax.tree_util.tree_map(
                    lambda _: NamedSharding(self.mesh, P(tx, ax)),
                    state.blobs,
                )
            sh = PTState(
                coords=NamedSharding(
                    self.mesh, P(tx, ax, self._param_axis)
                ),
                log_like=NamedSharding(self.mesh, P(tx, ax)),
                log_prior=NamedSharding(self.mesh, P(tx, ax)),
                random_state=NamedSharding(self.mesh, P()),
                blobs=blob_sh,
            )
            from .multihost import tree_put

            state = tree_put(state, sh)
        return state

    def _adapt_ladder(self, swap_acc, prev_swaps, chunk_props, done):
        """Diminishing ladder adaptation (Vousden et al. 2016, eq. 11-12).

        Adjust log temperature gaps toward equal adjacent swap acceptance:
        ``dS_i = kappa * (A_i - A_{i+1})`` with ``S_i = log(T_i - T_{i-1})``
        and ``kappa = (1/adaptation_time) * lag / (t + lag)`` decaying so
        the chain remains asymptotically exact.  beta_0 = 1 stays pinned.
        """
        T = self.ntemps
        if T < 3:
            return np.asarray(self.betas), prev_swaps
        cur = np.asarray(swap_acc).sum(axis=1)[: max(self.ntemps - 1, 1)]
        delta = cur - prev_swaps
        attempts = max(
            (chunk_props // max(self.swap_every, 1)) * self.nwalkers // 2,
            1,
        )
        A = delta / attempts  # (T-1,) pair acceptance rates
        kappa = (1.0 / self.adaptation_time) * (
            self.adaptation_lag / (done + self.adaptation_lag)
        )
        temps = 1.0 / self.betas
        S = np.log(np.diff(temps))
        # Gap i sits between rungs (i, i+1); drive A_i toward A_{i+1}
        # (the last gap has no upper neighbor and holds still).
        grad = np.zeros(T - 1)
        grad[: T - 2] = A[: T - 2] - A[1 : T - 1]
        S += kappa * np.clip(grad, -1.0, 1.0)
        temps = np.concatenate([[temps[0]], temps[0] + np.cumsum(np.exp(S))])
        # Pure: the caller commits the new ladder to self.betas together
        # with the chunk's save/anchors (interrupt consistency).
        return 1.0 / temps, cur

    def _commit_anchors(self, carries, state, new_betas=None):
        """Advance the resume anchors (and, when adapting, the ladder)
        as one group; callers wrap this in ``defer_interrupts``."""
        if new_betas is not None:
            self.betas = new_betas
        self._move_carries = carries
        self._previous_state = state

    def _fetch_global(self, out, every_process=False):
        """Device->host fetch that works when arrays are sharded across
        processes: all-gather to every host, then (unless every_process)
        only process 0 keeps the result for the backend write."""
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            out = multihost_utils.process_allgather(out, tiled=True)
            if not every_process and jax.process_index() != 0:
                return None
            return jax.tree_util.tree_map(np.asarray, out)
        return jax.device_get(out)

    def _count_proposed_delta(self, lo, hi):
        """Per-pair swap-attempt counts for global proposal indices
        ``[lo, hi)`` — mirrors the device schedule exactly (an attempt
        fires where ``step % swap_every == swap_every - 1``, with
        even/odd pairing by step parity).  Called once per chunk with
        that chunk's index range, so the host-side accounting is O(total
        attempts) over a whole run, not O(chunks x run prefix)."""
        out = np.zeros(max(self.ntemps - 1, 1), dtype=np.int64)
        se = self.swap_every
        if se <= 0:
            return out
        first = lo + ((se - 1 - lo) % se)
        sidxs = np.arange(first, hi, se, dtype=np.int64)
        for parity in (0, 1):
            cnt = int(np.count_nonzero((sidxs % 2) == parity))
            if cnt:
                out[parity : self.ntemps - 1 : 2] += cnt * self.nwalkers
        return out

    def _max_chunk(self, blobs=None):
        """Kept steps per device dispatch, bounded by ``io_chunk_bytes``
        (4096-step cap: dispatch overhead keeps paying off up to ~4k
        steps/chunk on this runtime — chunk-length sweep,
        docs/performance.md)."""
        full = np.dtype(
            jax.dtypes.canonicalize_dtype(np.float64)
        ).itemsize
        coords_itemsize = (
            self._io_dtype.itemsize if self._io_dtype is not None else full
        )
        n_tw = self.ntemps * self.nwalkers
        bytes_per_step = (
            n_tw * self.ndim * coords_itemsize + 3 * n_tw * full
        )
        if blobs is not None:
            # Blob leaves ride the same scan output buffer; a data-sized
            # blob must shrink the chunk or the buffer bound is fiction.
            for leaf in jax.tree_util.tree_leaves(blobs):
                itemsize = (
                    self._io_dtype.itemsize
                    if self._io_dtype is not None
                    and jnp.issubdtype(leaf.dtype, jnp.floating)
                    else leaf.dtype.itemsize
                )
                bytes_per_step += leaf.size * itemsize
        return max(
            1, min(4096, self._io_chunk_bytes // max(1, bytes_per_step))
        )

    def _drive(self, initial_state, sizes, thin_by, store, tune,
               skip_check, pbar=None, pregrow=None):
        """Advance the chain chunk by chunk (the shared engine of
        :meth:`run_mcmc` and :meth:`sample`).

        Yields the post-chunk :class:`PTState` after each chunk's data
        and resume anchors have committed.  ``pregrow`` pre-sizes the
        backend once (with the blob template) so per-chunk saves never
        reallocate the chain.
        """
        thin_by = int(thin_by)
        trusted = False
        if initial_state is None:
            if self._previous_state is None:
                raise ValueError(
                    "Cannot have `initial_state=None` on the first call"
                )
            initial_state = self._previous_state
            trusted = True
        state = self._prepare_state(
            initial_state, skip_check, trusted=trusted
        )
        if callable(sizes):  # deferred schedule (needs the blob shapes)
            sizes = sizes(state)
        blobs_struct = blobs_struct_of(state.blobs)
        if store and pregrow is not None:
            self.backend.grow(
                pregrow, self._grow_blobs_template(state.blobs)
            )
        # Move carries (tuned scales, sequential counters) persist across
        # calls like EnsembleSampler's; reset() keeps them (reference
        # move-object semantics).
        carries = getattr(self, "_move_carries", None)
        if carries is None:
            carries = self._init_carries()
        swap_acc = jnp.zeros(
            (self.ntemps, self.nwalkers), dtype=jnp.int32
        )
        if self.mesh is not None:
            from .multihost import device_put_global

            swap_acc = device_put_global(
                swap_acc,
                NamedSharding(
                    self.mesh, P(self._temp_axis, self.walker_axis)
                ),
            )

        # Exact per-pair proposal counts, using the same GLOBAL proposal
        # indices the device uses (kept0 threads the offset into the
        # scan), accumulated incrementally chunk by chunk.
        kept0 = self.backend.iteration if store else 0
        step0 = kept0 * thin_by
        proposed_cum = np.zeros(max(self.ntemps - 1, 1), dtype=np.int64)

        betas_dev = jnp.asarray(self.betas)
        prev_swaps = np.zeros(max(self.ntemps - 1, 1), dtype=np.int64)
        proposals_done = 0
        kept_done = 0
        try:
            for n in sizes:
                run = self._build_chunk(
                    int(n), thin_by, store, tune, blobs_struct
                )
                state, carries, swap_acc, outs = run(
                    state,
                    carries,
                    swap_acc,
                    betas_dev,
                    jnp.asarray(kept0 + kept_done, dtype=jnp.int32),
                )
                if store and not getattr(
                    self.backend, "wants_device_arrays", False
                ):
                    # Start the device->host DMA now (overlaps the host
                    # bookkeeping below; see EnsembleSampler.run_mcmc).
                    kick_async_fetch(outs)
                proposed_cum += self._count_proposed_delta(
                    step0 + proposals_done,
                    step0 + proposals_done + n * thin_by,
                )
                proposals_done += n * thin_by
                kept_done += n
                new_betas = None
                if self.adaptive:
                    swap_acc_host = self._fetch_global(
                        swap_acc, every_process=True
                    )
                    new_betas, prev_swaps = self._adapt_ladder(
                        swap_acc_host,
                        prev_swaps,
                        n * thin_by,
                        proposals_done,
                    )
                    # The next chunk runs on the adapted ladder either
                    # way; self.betas commits with the save/anchors so
                    # an interrupt cannot leave the in-memory ladder
                    # ahead of the stored chain.
                    betas_dev = jnp.asarray(new_betas)
                if not store:
                    with defer_interrupts():
                        self._commit_anchors(carries, state, new_betas)
                    if pbar is not None:
                        pbar.update(n * thin_by)
                    yield state
                    continue
                if (
                    getattr(self.backend, "wants_device_arrays", False)
                    and jax.process_count() == 1
                ):
                    # PTDeviceBackend: the chain block stays in HBM; only
                    # the tiny (T, nw) swap counters cross to the host.
                    coords, ll, lpr, blobs, accs = outs
                    swap_acc_host = jax.device_get(swap_acc)
                else:
                    fetched = self._fetch_global((outs, swap_acc))
                    if fetched is None:  # non-zero process: no backend
                        with defer_interrupts():
                            self._commit_anchors(carries, state, new_betas)
                        if pbar is not None:
                            pbar.update(n * thin_by)
                        yield state
                        continue
                    (coords, ll, lpr, blobs, accs), swap_acc_host = fetched
                swaps_delta = np.asarray(swap_acc_host).sum(axis=1)[
                    : max(self.ntemps - 1, 1)
                ]
                # swap_acc accumulates across chunks within this run;
                # only the attempts actually issued so far are credited,
                # so the stored accepted/proposed pair stays consistent
                # mid-run too.
                # Resume anchors advance together with the saved data —
                # an interrupt mid-run leaves the stored chain and the
                # anchors mutually consistent (same contract as
                # EnsembleSampler.run_mcmc); SIGINT is deferred across
                # the commit + anchor group.
                with defer_interrupts():
                    # Store the adapted ladder, but commit it to
                    # self.betas only after the save succeeds — a save
                    # that dies mid-write must leave the in-memory
                    # ladder matching the last ladder that actually
                    # landed in the backend.
                    self.backend.save_chunk(
                        coords,
                        ll,
                        lpr,
                        accs,
                        self._base_swaps_accepted + swaps_delta,
                        self._base_swaps_proposed + proposed_cum,
                        state.random_state,
                        self.betas if new_betas is None else new_betas,
                        blobs=blobs,
                    )
                    self._commit_anchors(carries, state, new_betas)
                if pbar is not None:
                    pbar.update(n * thin_by)
                yield state
        finally:
            # Rebase the swap counters from whatever actually landed, so
            # an interrupted run's partially-credited counters are not
            # regressed by the next run's base + delta writes.
            if store and jax.process_index() == 0 and (
                self.backend.initialized
            ):
                self._base_swaps_accepted = np.asarray(
                    self.backend.swaps_accepted
                )
                self._base_swaps_proposed = np.asarray(
                    self.backend.swaps_proposed
                )

    def run_mcmc(
        self,
        initial_state,
        nsteps,
        thin_by=1,
        store=True,
        tune=False,
        skip_initial_state_check=False,
        progress=False,
        progress_kwargs=None,
        thin=None,  # deprecated; trailing so positional calls don't shift
    ):
        """Run ``nsteps`` kept steps; returns the final :class:`PTState`.

        ``thin=`` is the deprecated v1.2-era argument (counts proposals);
        use ``thin_by`` (counts kept steps)."""
        if thin is not None:
            nsteps, thin_by = shim_thin(nsteps, thin)
        nsteps = int(nsteps)
        thin_by = int(thin_by)

        # The schedule is built inside _drive once the prepared state is
        # known, so blob bytes (only discoverable after the first
        # log-like evaluation) count against io_chunk_bytes.
        def sizes(state):
            return chunk_schedule(
                nsteps,
                self._max_chunk(state.blobs),
                self._mixture_block if len(self._moves) > 1 else 1,
            )

        from ..profiling import RunStats

        stats = RunStats(
            nsteps=nsteps,
            nproposals=nsteps * thin_by,
            nwalkers=self.ntemps * self.nwalkers,
        )
        t_run = t_chunk = time.perf_counter()
        state = None
        with get_progress_bar(
            progress, nsteps * thin_by, **(progress_kwargs or {})
        ) as pbar:
            for state in self._drive(
                initial_state, sizes, thin_by, store, tune,
                skip_initial_state_check, pbar, pregrow=nsteps,
            ):
                stats.chunks += 1
                now = time.perf_counter()
                stats.chunk_times.append(now - t_chunk)
                t_chunk = now
        if state is None:  # nsteps == 0
            state = self._prepare_state(
                initial_state
                if initial_state is not None
                else self._previous_state,
                skip_initial_state_check,
            )
        jax.block_until_ready(state.coords)
        stats.walltime_s = time.perf_counter() - t_run
        # Same throughput-counter surface as EnsembleSampler.run_mcmc;
        # nwalkers counts all rungs (ntemps * nwalkers model evals/step).
        self.last_run_stats = stats
        return state

    def sample(
        self,
        initial_state,
        iterations=1,
        thin_by=1,
        store=True,
        tune=False,
        skip_initial_state_check=False,
        progress=False,
        progress_kwargs=None,
        thin=None,  # deprecated; trailing so positional calls don't shift
    ):
        """Generator yielding a :class:`PTState` every ``thin_by`` proposals
        (the v1.2-era ``PTSampler.sample`` surface).  ``iterations=None``
        streams forever with ``store=False``.

        Runs on the same chunked engine as :meth:`run_mcmc` with
        one-step chunks — storage is pre-grown once and the per-yield
        cost is O(1) in the chain length (swap accounting is
        incremental), so a long generator run is O(n), not O(n^2).
        """
        if iterations is None and store:
            raise ValueError(
                "'store' must be False when 'iterations' is None"
            )
        if thin is not None:
            iterations, thin_by = shim_thin(iterations, thin)
        if iterations is None:
            import itertools

            sizes = itertools.repeat(1)
            total = None
        else:
            sizes = [1] * int(iterations)
            total = int(iterations) * int(thin_by)
        with get_progress_bar(
            progress, total, **(progress_kwargs or {})
        ) as pbar:
            yield from self._drive(
                initial_state, sizes, thin_by, store, tune,
                skip_initial_state_check, pbar, pregrow=iterations,
            )

    # ------------------------------------------------------------------
    @property
    def acceptance_fraction(self):
        return self.accepted / float(max(self.iteration, 1))

    @property
    def tswap_acceptance_fraction(self):
        return self.swaps_accepted / np.maximum(self.swaps_proposed, 1)

    def get_chain(self, discard=0, thin=1, flat=False, temp=None):
        """Stored chain ``(it, T, nw, nd)`` (or one rung with ``temp``)."""
        return self.backend.get_chain(
            discard=discard, thin=thin, flat=flat, temp=temp
        )

    def get_log_like(self, discard=0, thin=1):
        return self.backend.get_log_like(discard=discard, thin=thin)

    def get_log_prior(self, discard=0, thin=1):
        return self.backend.get_log_prior(discard=discard, thin=thin)

    def get_blobs(self, discard=0, thin=1, temp=None):
        """Stored user blobs, or None when the model returns none.

        In-memory and device backends return the blob pytree with
        ``(it, T, nw, ...)`` leaves.  :class:`PTHDFBackend` returns what
        is on disk — multi-leaf blobs come back as one structured numpy
        record array of shape ``(it, T, nw)`` with one field per leaf
        (the reference on-disk schema; same contract as the flat
        ``HDFBackend``).  ``temp`` selects one rung either way."""
        return self.backend.get_blobs(
            discard=discard, thin=thin, temp=temp
        )

    def get_last_sample(self):
        return self.backend.get_last_sample()

    def get_autocorr_time(self, discard=0, thin=1, temp=0, **kwargs):
        x = self.get_chain(discard=discard, thin=thin, temp=temp)
        return thin * autocorr.integrated_time(x, **kwargs)

    def log_evidence_estimate(
        self, discard=0, method="ti", return_error=False
    ):
        """ln-evidence estimate from the stored tempered chains.

        Args:
            discard: burn-in rows to drop.
            method: ``"ti"`` (default) — trapezoid thermodynamic
                integration of the ladder of mean log-likelihoods (the
                estimator of ptemcee's ``log_evidence_estimate``);
                ``"stepping-stone"`` — Xie et al. (2011): chain the
                per-rung importance ratios
                ``Z(b_{k+1})/Z(b_k) = E_{b_k}[L^(b_{k+1}-b_k)]``, each
                a logsumexp over that rung's stored samples.  Lower
                discretization bias than TI on coarse ladders, at the
                cost of using sample maxima (needs a few hundred stored
                rows per rung to settle).
            return_error: also return a ladder-resolution uncertainty:
                ``|lnZ(full ladder) - lnZ(every other rung)|``
                (ptemcee's convention).

        Both methods need the ladder to reach small beta; the segment
        below the hottest stored rung (``[0, beta_min)``) is closed with
        the flat extension ``beta_min * mean_ll[hottest]``, exact in the
        ``beta_min -> 0`` limit (the default geometric ladder puts
        ``beta_min ~ ratio**-(T-1)``, negligible for T ≳ 10).

        Returns:
            ``lnz`` or, with ``return_error``, ``(lnz, dlnz)``.

        Note:
            Both estimators weight stored samples by the *current*
            ladder ``self.betas``.  After an ``adaptive=True`` run, set
            ``discard`` past the adaptation phase so the kept samples
            were actually drawn at (approximately) those betas.
        """
        ll = np.asarray(self.get_log_like(discard=discard))  # (it, T, nw)
        betas = self.betas
        order = np.argsort(betas)
        b = betas[order]
        ll = ll[:, order, :]

        def _estimate(b, ll):
            mean_ll = ll.mean(axis=(0, 2))  # (T,)
            tail = b[0] * mean_ll[0] if b[0] > 0 else 0.0
            if method == "ti":
                return np.trapezoid(mean_ll, b) + tail
            if method == "stepping-stone":
                # ln E_{b_k}[L^(b_{k+1}-b_k)] via logsumexp over the
                # (it * nw) samples stored at rung k.
                samples = ll.transpose(1, 0, 2).reshape(ll.shape[1], -1)
                lnz = tail
                for k in range(len(b) - 1):
                    w = (b[k + 1] - b[k]) * samples[k]
                    wmax = np.max(w)
                    lnz += (
                        wmax
                        + np.log(np.mean(np.exp(w - wmax)))
                    )
                return lnz
            raise ValueError(
                f"unknown evidence method {method!r}; "
                "use 'ti' or 'stepping-stone'"
            )

        lnz = _estimate(b, ll)
        if not return_error:
            return lnz
        # Half-resolution ladder, keeping the coldest (beta=1) rung:
        # every other rung counted from the top.
        keep = np.zeros(len(b), dtype=bool)
        keep[len(b) - 1 :: -2] = True
        lnz2 = _estimate(b[keep], ll[:, keep, :])
        return lnz, abs(lnz - lnz2)
