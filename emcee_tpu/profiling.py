"""Tracing and throughput instrumentation.

The reference has no profiling story (SURVEY §5: ad-hoc ``time.time()`` in
a tutorial); here the device-side story is ``jax.profiler`` and the
host-side story is per-run throughput counters the sampler fills in.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import List, Optional

import jax

__all__ = ["trace", "RunStats"]


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    """Capture a device profile around a sampling run.

    Usage::

        from emcee_tpu.profiling import trace
        with trace("/tmp/emcee-trace"):
            sampler.run_mcmc(p0, 1000)

    View with TensorBoard's profile plugin or Perfetto.
    """
    jax.profiler.start_trace(
        logdir, create_perfetto_link=create_perfetto_link
    )
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class RunStats:
    """Throughput counters for one ``run_mcmc`` call.

    Accuracy caveat: the run is closed with ``jax.block_until_ready``,
    which some remote/tunneled runtimes release before execution truly
    finishes — a run that fetches nothing (``store=False``, or a
    device-resident backend) can then under-count ``walltime_s`` and
    over-report the rates.  Pass ``run_mcmc(..., accurate_timing=True)``
    to close the timing window with a forced value fetch of the final
    ``log_prob`` (one ``(nwalkers,)`` transfer) instead; the
    ``accurate`` flag records which way ``walltime_s`` was measured.
    bench.py forces fetches in its own timing windows the same way.
    """

    nsteps: int = 0
    nproposals: int = 0
    nwalkers: int = 0
    walltime_s: float = 0.0
    chunks: int = 0
    chunk_times: List[float] = field(default_factory=list)
    accurate: bool = False

    @property
    def steps_per_sec(self) -> float:
        return self.nproposals / self.walltime_s if self.walltime_s else 0.0

    @property
    def walker_steps_per_sec(self) -> float:
        return self.steps_per_sec * self.nwalkers

    def summary(self) -> str:
        return (
            f"{self.nsteps} kept steps ({self.nproposals} proposals) x "
            f"{self.nwalkers} walkers in {self.walltime_s:.3f}s -> "
            f"{self.steps_per_sec:,.1f} it/s, "
            f"{self.walker_steps_per_sec:,.1f} walker-steps/s"
        )
