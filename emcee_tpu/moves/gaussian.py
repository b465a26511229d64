"""Gaussian Metropolis move.

Matches the reference (``/root/reference/src/emcee/moves/gaussian.py:10-118``):
scalar / diagonal / full-covariance proposals; ``vector`` / ``random`` /
``sequential`` update modes; optional random step scale
``exp(U(-log f, log f))``.  The reference keeps the ``sequential`` dim
counter as mutable object state (``gaussian.py:99-101``); here it is a scan
carry so the move stays a pure function.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .base import robbins_monro_tune
from .mh import MHMove

__all__ = ["GaussianMove"]

_ALLOWED_MODES = ("vector", "random", "sequential")


class GaussianMove(MHMove):
    """Metropolis step with Gaussian proposal.

    Args:
        cov: scalar (isotropic), vector (axis-aligned), or square matrix
            (general) proposal covariance.
        mode: "vector" (all dims), "random" (one random dim per walker), or
            "sequential" (cycle dims).
        factor: optional random scale range; stddev is multiplied by
            ``exp(U(-log factor, log factor))``.  Invalid for matrix
            covariance (reference ``_proposal.allowed_modes``).
        tune_target: optional target acceptance rate; with
            ``run_mcmc(..., tune=True)`` the proposal scale adapts by
            Robbins-Monro toward it (the reference exposes the tune hook,
            ``moves/move.py:9-10``, but ships no tuning move; 0.234 is
            the classic high-dim optimum, ~0.44 for 1-D).
        tune_rate: adaptation step size (decays as 1/sqrt(t)).
    """

    def __init__(self, cov, mode="vector", factor=None, tune_target=None,
                 tune_rate=0.2):
        self._full_cov = None
        self._scale = None
        ndim = None
        try:
            float(cov)
            self._scale = np.sqrt(float(cov))
        except TypeError:
            cov = np.atleast_1d(np.asarray(cov))
            if cov.ndim == 1:
                ndim = len(cov)
                self._scale = np.sqrt(cov)
            elif cov.ndim == 2 and cov.shape[0] == cov.shape[1]:
                ndim = cov.shape[0]
                self._full_cov = cov
                self._chol = np.linalg.cholesky(cov)
            else:
                raise ValueError("Invalid proposal scale dimensions")

        if self._full_cov is not None and mode != "vector":
            raise ValueError(
                (
                    "'{0}' is not a recognized mode. "
                    "Please select from: {1}"
                ).format(mode, ["vector"])
            )
        if mode not in _ALLOWED_MODES:
            raise ValueError(
                (
                    "'{0}' is not a recognized mode. "
                    "Please select from: {1}"
                ).format(mode, list(_ALLOWED_MODES))
            )
        if factor is not None and factor < 1.0:
            raise ValueError("'factor' must be >= 1.0")
        self._log_factor = None if factor is None else np.log(factor)
        self.tune_target = tune_target
        self.tune_rate = float(tune_rate)
        self.mode = mode
        super().__init__(self._make_proposal(), ndim=ndim)
        # Only the isotropic whole-vector update is well-defined when the
        # parameter axis is sharded (diag/full scales and dim-masks would
        # need the global dim index).
        self._param_shard_ok = (
            mode == "vector"
            and self._full_cov is None
            and np.ndim(self._scale) == 0
        )

    def init_carry(self, nwalkers, ndim):
        carry = {}
        if self.mode == "sequential":
            carry["index"] = jnp.zeros((), dtype=jnp.int32)
        if self.tune_target is not None:
            carry["log_adj"] = jnp.zeros((), dtype=jnp.float32)
            carry["t"] = jnp.zeros((), dtype=jnp.int32)
        return carry

    def tune(self, carry, state, accepted, model=None):
        """Robbins-Monro scale adaptation toward ``tune_target``
        (shared helper; globally-averaged acceptance, see base.py)."""
        if self.tune_target is None:
            return carry
        return robbins_monro_tune(
            carry, accepted, self.tune_target, self.tune_rate, model
        )

    def _make_proposal(self):
        mode = self.mode
        log_factor = self._log_factor
        scale = self._scale
        chol = getattr(self, "_chol", None)

        def proposal(key, x0, carry):
            nw, nd = x0.shape
            k_f, k_n, k_m = jax.random.split(key, 3)
            if log_factor is None:
                f = 1.0
            else:
                f = jnp.exp(
                    jax.random.uniform(
                        k_f, (), minval=-log_factor, maxval=log_factor
                    )
                )
            if "log_adj" in carry:
                f = f * jnp.exp(carry["log_adj"])
            z = jax.random.normal(k_n, (nw, nd), dtype=x0.dtype)
            if chol is not None:
                step = z @ jnp.asarray(chol, dtype=x0.dtype).T
            else:
                step = z * jnp.asarray(scale, dtype=x0.dtype)
            xnew = x0 + f * step

            factors = jnp.zeros(nw, dtype=x0.dtype)
            if mode == "vector":
                return xnew, factors, carry
            if mode == "random":
                dims = jax.random.randint(k_m, (nw,), 0, nd)
            else:  # sequential: same dim for all walkers, cycling
                dims = jnp.full(
                    (nw,), carry["index"] % nd, dtype=jnp.int32
                )
                carry = {**carry, "index": (carry["index"] + 1) % nd}
            mask = jax.nn.one_hot(dims, nd, dtype=bool)
            q = jnp.where(mask, xnew, x0)
            return q, factors, carry

        return proposal
