"""Gradient-based moves: MALA and HMC via JAX autodiff.

No counterpart exists in the reference (it is a gradient-free library by
construction — numpy log-probs have no derivatives).  Here the user's
log-prob is a JAX function, so its gradient is free (``jax.grad``
through the same wrapped callable every other move evaluates,
``model.compute_log_prob``), and Langevin/Hamiltonian proposals become
natural members of the move family:

* :class:`MALAMove` — Metropolis-adjusted Langevin: drift along the
  gradient plus Gaussian noise, with the exact asymmetric-proposal
  correction.  Two gradient evaluations per step.
* :class:`HMCMove` — Hamiltonian Monte Carlo: ``n_leapfrog``
  velocity-Verlet steps with fresh Gaussian momenta, accepted by the
  Hamiltonian difference.  ``n_leapfrog + 1`` gradient evaluations per
  step; mixes in far fewer steps than random-walk moves on smooth,
  high-dimensional targets.
* :class:`ChEESHMCMove` — HMC whose trajectory length adapts itself by
  stochastic gradient ascent on the ChEES criterion across the
  ensemble (Hoffman, Radul & Sountsov 2021) — the SPMD-friendly
  alternative to NUTS (whose per-chain early stopping batches
  catastrophically; see ``docs/moves.md``).
* :class:`EnsembleMALAMove` — affine-invariant Langevin: a red-blue
  move whose MALA step is preconditioned by the complementary group's
  sample covariance; the ensemble supplies the geometry, nothing to
  tune.
* :class:`EnsembleHMCMove` — affine-invariant HMC: the same
  complement-covariance metric as the mass matrix of a leapfrog
  trajectory.  The zero-configuration version of
  ``HMCMove(cov=...)``, which needs the target covariance by hand.

Both update the whole ensemble at once (no complement; embarrassingly
parallel under walker sharding like :class:`~.mh.MHMove`), and both
support ``tune_target=`` Robbins-Monro step-size adaptation (0.574 is
the MALA optimum, ~0.65-0.8 typical for HMC).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import Move, ScaleTunable, accept_update, robbins_monro_tune
from .red_blue import RedBlueMove

__all__ = [
    "MALAMove",
    "HMCMove",
    "ChEESHMCMove",
    "EnsembleMALAMove",
    "EnsembleHMCMove",
]


def _batch_grad(model):
    """d log-prob / d coords for the whole batch: the per-walker
    log-probs decouple, so the gradient of their sum is the stack of
    per-walker gradients — one backward pass for the ensemble.  Under
    parameter sharding this differentiates the shard-local PARTIAL
    log-prob (``model.log_prob_for_grad``): the local block's gradient
    depends only on the local partial sum, and differentiating through
    the psum would overcount by the axis size.

    Note on caching: the current state's gradient could be carried
    across steps (``where(accepted, g_q, g_x)``), saving one backward
    pass — but move carries are replicated (not walker-sharded) in the
    sharded step, and PT swap moves exchange coordinates between rungs
    without touching carries, so a cached gradient would go stale there;
    we recompute instead.
    """
    fn_probe = (
        getattr(model, "compute_log_prob_partial", None)
        or model.compute_log_prob
    )
    if not getattr(model, "grad_ok", True) or getattr(
        fn_probe, "_no_grad", False
    ):
        raise NotImplementedError(
            "gradient moves need a differentiable log-prob; "
            "host_callback=True wraps a non-traceable function with "
            "jax.pure_callback, which has no JVP — use a JAX-traceable "
            "log_prob_fn"
        )
    fn = model.log_prob_for_grad()

    def neg_potential_sum(x):
        lp, _ = fn(x)
        return jnp.sum(lp)

    return jax.grad(neg_potential_sum)


class _GradientMove(ScaleTunable, Move):
    """Shared machinery: gradient of the batched log-prob, step-size
    carry, tuning, optional preconditioner."""

    def __init__(self, step_size, cov=None, tune_target=None,
                 tune_rate=0.2):
        self.step_size = float(step_size)
        if self.step_size <= 0:
            raise ValueError("step_size must be positive")
        self.tune_target = tune_target
        self.tune_rate = float(tune_rate)
        # Preconditioner: proposal metric C = L L^T (None = identity;
        # scalar/vector = diagonal; matrix = full covariance).  All the
        # quadratic forms reduce to matvecs by L / L^T — no triangular
        # solves (see MALAMove.propose).
        import numpy as np

        self._precond = "id"
        self._L = None
        if cov is not None:
            try:
                c = float(cov)
                if not np.isfinite(c) or c <= 0:
                    raise ValueError("cov must be positive and finite")
                self._L = float(np.sqrt(c))
                self._precond = "scalar"
            except TypeError:
                cov = np.atleast_1d(np.asarray(cov, dtype=np.float64))
                if cov.ndim == 1:
                    if not np.all(np.isfinite(cov)) or np.any(cov <= 0):
                        raise ValueError(
                            "diagonal cov entries must be positive and "
                            "finite"
                        )
                    self._L = np.sqrt(cov)
                    self._precond = "diag"
                elif cov.ndim == 2 and cov.shape[0] == cov.shape[1]:
                    if not np.all(np.isfinite(cov)):
                        raise ValueError("cov entries must be finite")
                    self._L = np.linalg.cholesky(cov)
                    if not np.all(np.isfinite(self._L)):
                        raise ValueError("cov must be positive definite")
                    self._precond = "full"
                else:
                    raise ValueError("Invalid cov dimensions")

    def _check_precond(self, model):
        if self._precond != "id" and model.param_axis is not None:
            raise NotImplementedError(
                "preconditioned gradient moves do not support "
                "parameter-axis sharding (the metric couples dimensions)"
            )

    def _apply_L(self, v):
        """v -> v L^T (rows are walkers): maps y-space to x-space."""
        if self._precond == "id":
            return v
        if self._precond in ("scalar", "diag"):
            return v * jnp.asarray(self._L, dtype=v.dtype)
        return v @ jnp.asarray(self._L, dtype=v.dtype).T

    def _apply_LT(self, v):
        """v -> v L: maps x-space gradients to y-space."""
        if self._precond == "id":
            return v
        if self._precond in ("scalar", "diag"):
            return v * jnp.asarray(self._L, dtype=v.dtype)
        return v @ jnp.asarray(self._L, dtype=v.dtype)

    # init_carry / tune come from the ScaleTunable mixin.

    def _eps(self, carry, dtype):
        eps = jnp.asarray(self.step_size, dtype=dtype)
        s = self._tuned_scale(carry, dtype)
        return eps if s is None else eps * s

    # Parameter-axis sharding: supported.  The gradient of the
    # psum-completed log-prob is shard-local (each shard's partial sum
    # depends only on its own parameter block), per-dim noise uses a
    # topology-invariant stream (full-dim draw, local slice), and the
    # per-walker dim reductions in factors/kinetic terms are
    # psum-completed.  Verified by matched-key equivalence vs a dense
    # run (tests/unit/test_param_sharding.py).

    @staticmethod
    def _dim_normal(key, nw, nd_local, model, dtype):
        """Per-(walker, dim) Gaussian noise with a topology-invariant
        stream: under parameter sharding, draw the full-dim block and
        slice this shard's columns, so sharded and dense runs produce
        identical chains at matched keys (the framework's
        bit-identical-across-topologies contract)."""
        if model.param_axis is None:
            return jax.random.normal(key, (nw, nd_local), dtype=dtype)
        nd_global = int(model.ndim)
        full = jax.random.normal(key, (nw, nd_global), dtype=dtype)
        start = jax.lax.axis_index(model.param_axis) * nd_local
        return jax.lax.dynamic_slice_in_dim(full, start, nd_local, axis=1)


class MALAMove(_GradientMove):
    """Metropolis-adjusted Langevin move.

    Proposal ``q = x + (eps^2/2) grad(x) + eps * N(0, I)`` with the exact
    asymmetry correction
    ``factors = log q(x|q) - log q(q|x)``.

    Args:
        step_size: the Langevin step ``eps``.
        tune_target: optional target acceptance for Robbins-Monro
            step-size adaptation under ``run_mcmc(..., tune=True)``
            (0.574 is the classic MALA optimum).
        tune_rate: adaptation rate (decays as ``1/sqrt(t)``).
    """

    def propose(self, key, state, model, carry):
        self._check_precond(model)
        nw, nd = state.coords.shape
        x = state.coords
        eps = self._eps(carry, x.dtype)
        grad = _batch_grad(model)

        k_noise, k_acc = jax.random.split(key)
        k_noise = model.fold_walker(k_noise)
        k_acc = model.fold_walker(k_acc)

        g_x = grad(x)
        z = self._dim_normal(k_noise, nw, nd, model, x.dtype)
        # Preconditioned drift C g = L L^T g; noise L z.
        q = (
            x
            + 0.5 * eps**2 * self._apply_L(self._apply_LT(g_x))
            + eps * self._apply_L(z)
        )

        new_log_prob, new_blobs = model.compute_log_prob(q)
        g_q = grad(q)
        # Metric-weighted residuals without triangular solves:
        # L^{-1}(q - x - (eps^2/2) C g_x) = eps z, and the reverse
        # residual L^{-1}(x - q - (eps^2/2) C g_q) expands to
        # -eps z - (eps^2/2) L^T (g_x + g_q).
        linv_rev = -eps * z - 0.5 * eps**2 * self._apply_LT(g_x + g_q)
        factors = (
            model.psum_params(jnp.sum(z**2, axis=-1))
            - model.psum_params(jnp.sum(linv_rev**2, axis=-1)) / eps**2
        ) / 2.0

        lnpdiff = new_log_prob - state.log_prob + factors
        accepted = jnp.log(
            jax.random.uniform(k_acc, (nw,), dtype=lnpdiff.dtype)
        ) < lnpdiff
        new_state = accept_update(
            state, q, new_log_prob, new_blobs, accepted
        )
        return new_state, accepted, carry


class HMCMove(_GradientMove):
    """Hamiltonian Monte Carlo move.

    ``n_leapfrog`` velocity-Verlet steps from freshly drawn unit
    Gaussian momenta; accept with
    ``log U < logpi(q) - logpi(x) + (|p0|^2 - |pL|^2)/2``.

    Args:
        step_size: leapfrog step ``eps``.
        n_leapfrog: number of leapfrog steps per proposal.
        jitter: relative step-size jitter; each proposal scales ``eps``
            by ``U(1 - jitter, 1 + jitter)``.  Breaks the resonance
            pathology where a near-(half-)periodic trajectory length on
            an oscillatory target makes some observables mix glacially
            (e.g. ``eps * L ~ pi`` on a unit normal nearly negates the
            position, so ``|x|`` barely moves).  0.2 is a good default
            for Gaussian-like targets.
        tune_target: optional Robbins-Monro step-size adaptation target
            (typical HMC operating range 0.65-0.8).
        tune_rate: adaptation rate.
    """

    def __init__(
        self,
        step_size,
        n_leapfrog=10,
        jitter=0.0,
        cov=None,
        tune_target=None,
        tune_rate=0.2,
    ):
        super().__init__(
            step_size, cov=cov, tune_target=tune_target,
            tune_rate=tune_rate,
        )
        self.n_leapfrog = int(n_leapfrog)
        if self.n_leapfrog < 1:
            raise ValueError("n_leapfrog must be >= 1")
        self.jitter = float(jitter)
        if not 0.0 <= self.jitter < 1.0:
            raise ValueError("jitter must be in [0, 1)")

    def propose(self, key, state, model, carry):
        self._check_precond(model)
        nw, nd = state.coords.shape
        x = state.coords
        eps = self._eps(carry, x.dtype)
        grad = _batch_grad(model)

        k_mom, k_acc, k_jit = jax.random.split(key, 3)
        k_mom = model.fold_walker(k_mom)
        k_acc = model.fold_walker(k_acc)
        if self.jitter > 0.0:
            # One scale per proposal (shared across walkers so the
            # leapfrog stays a single fused program).
            eps = eps * (
                1.0
                + self.jitter
                * jax.random.uniform(
                    k_jit, (), dtype=x.dtype, minval=-1.0, maxval=1.0
                )
            )

        p0 = self._dim_normal(k_mom, nw, nd, model, x.dtype)

        def leapfrog(carry2, _):
            # Velocity Verlet in the preconditioned (y = L^{-1} x) frame:
            # momenta are unit-mass there; gradients map by L^T, position
            # updates by L.  Identity preconditioner reduces to plain
            # leapfrog.
            xi, pi, gi = carry2
            pi = pi + 0.5 * eps * self._apply_LT(gi)
            xi = xi + eps * self._apply_L(pi)
            gi = grad(xi)
            pi = pi + 0.5 * eps * self._apply_LT(gi)
            return (xi, pi, gi), None

        (q, pL, _), _ = jax.lax.scan(
            leapfrog, (x, p0, grad(x)), None, length=self.n_leapfrog
        )

        new_log_prob, new_blobs = model.compute_log_prob(q)
        lnpdiff = (
            new_log_prob
            - state.log_prob
            + 0.5
            * model.psum_params(
                jnp.sum(p0**2, axis=-1) - jnp.sum(pL**2, axis=-1)
            )
        )
        accepted = jnp.log(
            jax.random.uniform(k_acc, (nw,), dtype=lnpdiff.dtype)
        ) < lnpdiff
        new_state = accept_update(
            state, q, new_log_prob, new_blobs, accepted
        )
        return new_state, accepted, carry


def _van_der_corput(n):
    """Base-2 van der Corput value of integer ``n >= 1`` in (0, 1):
    the 32-bit bit-reversal divided by 2^32.  A low-discrepancy jitter
    stream for trajectory lengths (Hoffman, Radul & Sountsov 2021 use a
    Halton sequence; base 2 is its first coordinate)."""
    n = n.astype(jnp.uint32)
    n = ((n & 0x55555555) << 1) | ((n >> 1) & 0x55555555)
    n = ((n & 0x33333333) << 2) | ((n >> 2) & 0x33333333)
    n = ((n & 0x0F0F0F0F) << 4) | ((n >> 4) & 0x0F0F0F0F)
    n = ((n & 0x00FF00FF) << 8) | ((n >> 8) & 0x00FF00FF)
    n = (n << 16) | (n >> 16)
    return n.astype(jnp.float32) * jnp.float32(2.0**-32)


class ChEESHMCMove(_GradientMove):
    """HMC with ChEES-adapted trajectory length — the SPMD answer to NUTS.

    NUTS adapts the trajectory per chain by recursive doubling with an
    early-stopping U-turn test, which is control flow that batches
    catastrophically under SPMD (every walker waits for the slowest; see
    ``docs/moves.md``).  ChEES-HMC (Hoffman, Radul & Sountsov, AISTATS
    2021) gets the same automation the ensemble-native way: all walkers
    share one trajectory length ``T`` that is adapted *across* the
    ensemble by stochastic gradient ascent on the Change-in-Estimator of
    the Expected Square criterion

        ``ChEES(T) = 1/4 E[(|q' - E q'|^2 - |q - E q|^2)^2]``,

    whose per-walker gradient with respect to ``T`` is available from
    quantities the proposal already computes (the end-point momentum).
    Each proposal integrates for ``ceil(u T / eps)`` leapfrog steps with
    a low-discrepancy jitter ``u ~ vdC(2)`` (jittering removes the
    resonance pathology and makes the criterion identifiable), and a
    ``run_mcmc(..., tune=True)`` phase adapts both

    * ``eps`` — Robbins-Monro toward ``tune_target`` acceptance (0.651,
      the HMC optimum, by default), and
    * ``T`` — Adam ascent on the acceptance-weighted ChEES gradient,

    after which the tuned values are frozen for production (diminishing
    adaptation; the carry persists across ``run_mcmc`` calls and
    ``reset()``).  The ensemble is what makes the criterion cheap: the
    cross-chain expectations are walker means (``pmean`` over shards),
    so 10^5 walkers give a near-noiseless gradient each step.

    Args:
        step_size: initial leapfrog step ``eps``.
        trajectory_length: initial total trajectory length ``T`` (in
            coordinate time, not steps); jittered per proposal.
        max_leapfrog: hard cap on leapfrog steps per proposal (bounds
            compile-time-unbounded ``while_loop`` work per step).
        cov: optional preconditioner (scalar / diag / full), as
            :class:`HMCMove`.
        tune_target: acceptance target for ``eps`` adaptation under
            ``tune=True`` (default 0.651; None freezes ``eps``).
        tune_rate: Robbins-Monro rate for ``eps``.
        adapt_rate: Adam learning rate for ``log T`` (decays as
            ``1/sqrt(t)``).

    The proposal itself never uses cross-walker statistics (only the
    adaptation does), so with ``tune=False`` walker-sharded runs remain
    bit-identical to dense ones.  The ChEES-gradient reductions (two
    ensemble means plus their collectives) are only traced when the
    driver passes ``tune=True`` (``wants_tune_flag`` contract), so
    production steps pay nothing for the adaptation machinery.
    """

    wants_tune_flag = True

    def __init__(
        self,
        step_size,
        trajectory_length=1.0,
        max_leapfrog=1024,
        cov=None,
        tune_target=0.651,
        tune_rate=0.2,
        adapt_rate=0.05,
    ):
        super().__init__(
            step_size, cov=cov, tune_target=tune_target,
            tune_rate=tune_rate,
        )
        self.trajectory_length = float(trajectory_length)
        if self.trajectory_length <= 0:
            raise ValueError("trajectory_length must be positive")
        self.max_leapfrog = int(max_leapfrog)
        if self.max_leapfrog < 1:
            raise ValueError("max_leapfrog must be >= 1")
        self.adapt_rate = float(adapt_rate)
        if self.adapt_rate <= 0:
            raise ValueError("adapt_rate must be positive")

    def init_carry(self, nwalkers, ndim):
        import numpy as np

        return {
            # eps Robbins-Monro state (ScaleTunable protocol).
            "log_adj": jnp.zeros((), dtype=jnp.float32),
            "t": jnp.zeros((), dtype=jnp.int32),
            # Trajectory-length Adam state.
            "log_T": jnp.asarray(
                np.log(self.trajectory_length), dtype=jnp.float32
            ),
            "m": jnp.zeros((), dtype=jnp.float32),
            "v": jnp.zeros((), dtype=jnp.float32),
            "k": jnp.zeros((), dtype=jnp.int32),
            # Pending ChEES gradient (set by propose, applied by tune).
            "g": jnp.zeros((), dtype=jnp.float32),
            # Proposal counter driving the van der Corput jitter.
            "n": jnp.ones((), dtype=jnp.int32),
        }

    def propose(self, key, state, model, carry, tune=False):
        self._check_precond(model)
        nw, nd = state.coords.shape
        x = state.coords
        eps = self._eps(carry, x.dtype)
        grad = _batch_grad(model)

        k_mom, k_acc = jax.random.split(key)
        k_mom = model.fold_walker(k_mom)
        k_acc = model.fold_walker(k_acc)

        # Jittered trajectory length: t_traj = u * T, u from the
        # low-discrepancy stream (shared across walkers and shards, so
        # the leapfrog trip count is one replicated scalar).
        u = _van_der_corput(carry["n"]).astype(x.dtype)
        T = jnp.exp(carry["log_T"]).astype(x.dtype)
        # Clip in float before the int cast: a blown-up T/eps ratio must
        # saturate at max_leapfrog, not overflow int32.
        n_steps = jnp.clip(
            jnp.ceil(u * T / eps), 1.0, float(self.max_leapfrog)
        ).astype(jnp.int32)

        p0 = self._dim_normal(k_mom, nw, nd, model, x.dtype)

        def cond(loop):
            return loop[0] < n_steps

        def body(loop):
            # Velocity Verlet in the preconditioned frame (see HMCMove).
            i, xi, pi, gi = loop
            pi = pi + 0.5 * eps * self._apply_LT(gi)
            xi = xi + eps * self._apply_L(pi)
            gi = grad(xi)
            pi = pi + 0.5 * eps * self._apply_LT(gi)
            return i + 1, xi, pi, gi

        _, q, pL, _ = jax.lax.while_loop(
            cond, body, (jnp.zeros((), jnp.int32), x, p0, grad(x))
        )

        new_log_prob, new_blobs = model.compute_log_prob(q)
        lnpdiff = (
            new_log_prob
            - state.log_prob
            + 0.5
            * model.psum_params(
                jnp.sum(p0**2, axis=-1) - jnp.sum(pL**2, axis=-1)
            )
        )
        accepted = jnp.log(
            jax.random.uniform(k_acc, (nw,), dtype=lnpdiff.dtype)
        ) < lnpdiff

        if tune:
            # --- ChEES gradient estimate (consumed by tune) ---------
            # d/dT of 1/4 (|q'-Eq'|^2 - |q-Eq|^2)^2 per walker, using
            # dq'/dT = u * dx/dt(T) = u * L p(T) (the leapfrog position
            # velocity is the *preconditioned* momentum); expectations
            # are ensemble means; walkers are weighted by their
            # acceptance probability.
            def wmean(val):
                mu = jnp.mean(val, axis=0)
                if model.axis_name is not None:
                    mu = jax.lax.pmean(mu, model.axis_name)
                return mu

            alpha = jnp.exp(jnp.minimum(lnpdiff, 0.0))
            alpha = jnp.where(jnp.isfinite(alpha), alpha, 0.0)
            dq = q - wmean(q)
            dx = x - wmean(x)
            delta = model.psum_params(
                jnp.sum(dq**2, axis=-1) - jnp.sum(dx**2, axis=-1)
            )
            ddelta_dT = 2.0 * u * model.psum_params(
                jnp.sum(dq * self._apply_L(pL), axis=-1)
            )
            per_walker = 0.5 * delta * ddelta_dT
            num = jnp.mean(alpha * per_walker)
            den = jnp.mean(alpha)
            if model.axis_name is not None:
                num = jax.lax.pmean(num, model.axis_name)
                den = jax.lax.pmean(den, model.axis_name)
            # Gradient with respect to log T (chain rule factor T).
            g = (T * num / (den + 1e-12)).astype(jnp.float32)
            g = jnp.where(jnp.isfinite(g), g, 0.0)
        else:
            # Production steps: no pending gradient, no reductions.
            g = jnp.zeros((), dtype=jnp.float32)

        carry = {**carry, "g": g, "n": carry["n"] + 1}
        new_state = accept_update(
            state, q, new_log_prob, new_blobs, accepted
        )
        return new_state, accepted, carry

    def tune(self, carry, state, accepted, model=None):
        if self.tune_target is not None:
            carry = robbins_monro_tune(
                carry, accepted, self.tune_target, self.tune_rate, model
            )
        # Adam ascent on log T from the pending ChEES gradient.
        b1, b2 = 0.9, 0.999
        g = carry["g"]
        k = carry["k"] + 1
        kf = k.astype(jnp.float32)
        m = b1 * carry["m"] + (1.0 - b1) * g
        v = b2 * carry["v"] + (1.0 - b2) * g * g
        mh = m / (1.0 - b1**kf)
        vh = v / (1.0 - b2**kf)
        lr = self.adapt_rate / jnp.sqrt(1.0 + kf)
        log_T = jnp.clip(
            carry["log_T"] + lr * mh / (jnp.sqrt(vh) + 1e-8),
            -15.0,
            15.0,
        )
        return {**carry, "log_T": log_T, "m": m, "v": v, "k": k}


def _complement_chol(c_parts, ridge, model, cls_name):
    """Complement sample covariance (+ ridge) and its Cholesky.

    Shared metric build of the affine-invariant gradient pair
    (:class:`EnsembleMALAMove` / :class:`EnsembleHMCMove`): a single MXU
    matmul over the frozen complementary group.  Raises under
    parameter-axis sharding — the metric couples dimensions.
    """
    if model.param_axis is not None:
        raise NotImplementedError(
            f"{cls_name} couples parameter dimensions (the "
            "complement-covariance metric) and does not support "
            "parameter-axis sharding"
        )
    c = jnp.concatenate(c_parts, axis=0)
    nc, nd = c.shape
    mu = jnp.mean(c, axis=0)
    X = (c - mu) / jnp.sqrt(jnp.asarray(nc - 1.0, dtype=c.dtype))
    C = X.T @ X + ridge * jnp.eye(nd, dtype=c.dtype)
    return C, jnp.linalg.cholesky(C)


class EnsembleMALAMove(RedBlueMove):
    """Affine-invariant Langevin: ensemble-preconditioned MALA.

    Each red-blue group takes a MALA step preconditioned by the
    *complementary* group's sample covariance (plus a small ridge).  The
    metric is built from walkers that are frozen during the half-step,
    so the update is a standard preconditioned MALA with a fixed metric
    and detailed balance holds — the same argument that validates every
    red-blue move.  The result is affine-invariant gradient sampling
    with no preconditioner to tune: the ensemble itself supplies the
    geometry, exactly in the spirit of Goodman & Weare's stretch move,
    but with Langevin drift (cf. affine-invariant Langevin samplers,
    e.g. Garbuno-Inigo et al. 2020).

    Args:
        step_size: Langevin step in the whitened frame; O(1) is right
            for near-Gaussian targets at moderate dimension (scale as
            ``d**(-1/6)`` for large d).
        ridge: diagonal regularizer added to the complement covariance.
        tune_target: optional Robbins-Monro step-size adaptation target
            (0.574 is the MALA optimum) under ``run_mcmc(..., tune=True)``.
        nsplits / randomize_split / live_dangerously: standard red-blue
            controls.

    Costs two gradient evaluations plus one ``(ndim, ndim)`` Cholesky
    per half-step; the covariance build is a single MXU matmul.
    Requires an unsharded parameter axis (the metric couples dims).
    """

    tunable = True

    def __init__(self, step_size=0.5, ridge=1e-6, **kwargs):
        self.step_size = float(step_size)
        if self.step_size <= 0:
            raise ValueError("step_size must be positive")
        self.ridge = float(ridge)
        super().__init__(**kwargs)

    def get_proposal(self, key, s, c_parts, model, scale=None):
        ns, nd = s.shape
        C, L = _complement_chol(
            c_parts, self.ridge, model, "EnsembleMALAMove"
        )

        eps = jnp.asarray(self.step_size, dtype=s.dtype)
        if scale is not None:
            eps = eps * scale

        grad = _batch_grad(model)

        g_s = grad(s)
        z = jax.random.normal(key, (ns, nd), dtype=s.dtype)
        # Rows are walkers: C g == g @ C (C symmetric); L z == z @ L.T.
        q = s + 0.5 * eps**2 * (g_s @ C) + eps * (z @ L.T)
        g_q = grad(q)
        # Same solve-free residual algebra as MALAMove.propose.
        linv_rev = -eps * z - 0.5 * eps**2 * ((g_s + g_q) @ L)
        factors = (
            jnp.sum(z**2, axis=-1)
            - jnp.sum(linv_rev**2, axis=-1) / eps**2
        ) / 2.0
        return q, factors


class EnsembleHMCMove(RedBlueMove):
    """Affine-invariant HMC: complement-covariance mass matrix.

    Each red-blue group runs ``n_leapfrog`` velocity-Verlet steps whose
    metric is the complementary group's sample covariance (plus a small
    ridge) — the zero-configuration counterpart of
    ``HMCMove(cov=...)``, exactly as :class:`EnsembleMALAMove` is to
    ``MALAMove(cov=...)``.  The metric is built from walkers frozen
    during the half-step, so the update is standard preconditioned HMC
    with a fixed mass matrix and detailed balance holds (the red-blue
    argument).  On well-conditioned-after-whitening targets each
    proposal is nearly an independent draw.

    Args:
        step_size: leapfrog step in the whitened frame (``~ d**(-1/4)``
            scaling at large dimension; 0.5 is right for near-Gaussian
            targets at moderate d).
        n_leapfrog: leapfrog steps per proposal (``n_leapfrog + 1``
            gradient evaluations per half-step).
        jitter: relative step-size jitter per half-step, breaking
            resonant trajectory lengths (see :class:`HMCMove`).
        ridge: diagonal regularizer on the complement covariance.
        tune_target: optional Robbins-Monro step-size adaptation target
            (typical HMC range 0.65-0.8) under ``run_mcmc(..., tune=True)``.

    Costs one ``(ndim, ndim)`` covariance build + Cholesky and
    ``2 * (n_leapfrog + 1)`` metric matvecs per half-step on top of the
    gradient work.  Requires an unsharded parameter axis.
    """

    tunable = True

    def __init__(
        self,
        step_size=0.5,
        n_leapfrog=5,
        jitter=0.2,
        ridge=1e-6,
        **kwargs,
    ):
        self.step_size = float(step_size)
        if self.step_size <= 0:
            raise ValueError("step_size must be positive")
        self.n_leapfrog = int(n_leapfrog)
        if self.n_leapfrog < 1:
            raise ValueError("n_leapfrog must be >= 1")
        self.jitter = float(jitter)
        if not 0.0 <= self.jitter < 1.0:
            raise ValueError("jitter must be in [0, 1)")
        self.ridge = float(ridge)
        super().__init__(**kwargs)

    def get_proposal(self, key, s, c_parts, model, scale=None):
        ns, nd = s.shape
        C, L = _complement_chol(
            c_parts, self.ridge, model, "EnsembleHMCMove"
        )

        eps = jnp.asarray(self.step_size, dtype=s.dtype)
        if scale is not None:
            eps = eps * scale

        k_mom, k_jit = jax.random.split(key)
        if self.jitter > 0.0:
            # One scale per half-step (shared across the group so the
            # leapfrog stays a single fused program).
            eps = eps * (
                1.0
                + self.jitter
                * jax.random.uniform(
                    k_jit, (), dtype=s.dtype, minval=-1.0, maxval=1.0
                )
            )

        grad = _batch_grad(model)
        p0 = jax.random.normal(k_mom, (ns, nd), dtype=s.dtype)

        def leapfrog(carry, _):
            # Velocity Verlet in the whitened (y = L^{-1} x) frame:
            # momenta are unit-mass there; x-space gradients map by
            # g -> g @ L, positions update by p -> p @ L.T (rows are
            # walkers, as in EnsembleMALAMove).
            xi, pi, gi = carry
            pi = pi + 0.5 * eps * (gi @ L)
            xi = xi + eps * (pi @ L.T)
            gi = grad(xi)
            pi = pi + 0.5 * eps * (gi @ L)
            return (xi, pi, gi), None

        (q, pL, _), _ = jax.lax.scan(
            leapfrog, (s, p0, grad(s)), None, length=self.n_leapfrog
        )
        # Hastings factor = kinetic-energy difference; the potential
        # difference is added by the engine's shared accept step.
        factors = 0.5 * (
            jnp.sum(p0**2, axis=-1) - jnp.sum(pL**2, axis=-1)
        )
        return q, factors
