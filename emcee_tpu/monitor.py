"""Built-in convergence monitoring.

The reference documents this as a user pattern (``docs/tutorials/
monitor.ipynb``): check the integrated autocorrelation time every N steps
and stop when the chain is longer than ``tau_factor * tau`` and tau has
stabilized to within ``dtau_rel``.  Here it is a first-class driver.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from .ops import autocorr

__all__ = ["ConvergenceMonitor", "run_until_converged"]


@dataclass
class ConvergenceMonitor:
    """Tracks tau estimates across checkpoints.

    Args:
        tau_factor: required chain length in units of tau (the reference
            pattern uses 100; ``integrated_time``'s own default tol is 50).
        dtau_rel: required relative change of tau between checks.
        rhat_threshold: optional; when set, additionally require the
            rank-normalized split R-hat (walkers as chains, second half
            of the chain) to fall below this per parameter.  1.01 is the
            standard gate.  Catches stuck walkers / non-stationarity
            that a stabilized tau can miss.
    """

    tau_factor: float = 100.0
    dtau_rel: float = 0.01
    rhat_threshold: Optional[float] = None
    history: List[np.ndarray] = field(default_factory=list)
    iterations: List[int] = field(default_factory=list)
    rhat_history: List[np.ndarray] = field(default_factory=list)

    def update(self, chain) -> bool:
        """Record a tau estimate from chain (nsteps, nwalkers, ndim).

        Returns True when converged.
        """
        tau = autocorr.integrated_time(chain, quiet=True)
        n = np.shape(chain)[0]
        self.history.append(tau)
        self.iterations.append(n)
        if self.rhat_threshold is not None and n // 2 >= 4:
            # Second half only: the R-hat gate should judge the
            # stationary segment, not the burn-in transient.  (Skipped
            # until the half-chain is long enough for split R-hat.)
            # The chain is passed through UNconverted: with a
            # DeviceBackend, tau above and the rank-normalized R-hat
            # both run jitted on-device (ops/autocorr._rhat_device) —
            # only the (n_param,) result crosses to the host.
            r = np.asarray(autocorr.rhat(chain[n // 2 :]))
            self.rhat_history.append(r)
        if np.any(~np.isfinite(tau)):
            return False
        converged = np.all(tau * self.tau_factor < n)
        if len(self.history) > 1:
            prev = self.history[-2]
            converged &= np.all(
                np.abs(prev - tau) / tau < self.dtau_rel
            )
        if self.rhat_threshold is not None:
            converged &= bool(self.rhat_history) and bool(
                np.all(self.rhat_history[-1] < self.rhat_threshold)
            )
        return bool(converged)

    @property
    def tau(self) -> Optional[np.ndarray]:
        return self.history[-1] if self.history else None

    @property
    def rhat(self) -> Optional[np.ndarray]:
        return self.rhat_history[-1] if self.rhat_history else None


def run_until_converged(
    sampler,
    initial_state,
    max_steps=100_000,
    check_every=1_000,
    monitor: Optional[ConvergenceMonitor] = None,
    progress=False,
    **kwargs,
):
    """Advance the chain until the tau-based criterion is met.

    Returns ``(state, monitor)``; ``monitor.tau`` holds the final estimate.
    Mirrors the monitor-tutorial loop: sample in blocks, estimate tau from
    the stored chain, stop at ``tau_factor * tau < iteration`` with a
    stable tau.

    Works with :class:`~.parallel.tempering.PTSampler` too: convergence
    is judged on the cold rung (``get_chain(temp=0)``), the chain whose
    samples are the posterior draws.
    """
    if monitor is None:
        monitor = ConvergenceMonitor()
    # Tempered samplers store (it, T, nw, nd); judge the beta=1 rung.
    tempered = hasattr(sampler, "betas")
    state = initial_state
    done = 0
    while done < max_steps:
        n = min(check_every, max_steps - done)
        state = sampler.run_mcmc(state, n, progress=progress, **kwargs)
        done += n
        chain = (
            sampler.get_chain(temp=0) if tempered else sampler.get_chain()
        )
        if monitor.update(chain):
            break
        # Subsequent calls continue from the sampler's previous state.
        state = None
    return sampler.get_last_sample(), monitor
