"""Effective-samples/sec benchmark (the second BASELINE headline metric).

Runs the north-star workload (5D Gaussian, 1e5 walkers) with storage on,
estimates the integrated autocorrelation time from the stored chain, and
reports effective samples per second:

    ESS/sec = nwalkers * steps_per_sec / tau

Usage: python benchmarks/ess.py [--walkers 100000] [--steps 600]
Prints one JSON line.
"""

import argparse
import json
import time

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp
import numpy as np

from emcee_tpu import EnsembleSampler, moves


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--walkers", type=int, default=100_000)
    ap.add_argument("--ndim", type=int, default=5)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--thin-by", type=int, default=5)
    args = ap.parse_args()

    def log_prob(x):
        return -0.5 * jnp.sum(x**2, axis=-1)

    sampler = EnsembleSampler(
        args.walkers,
        args.ndim,
        log_prob,
        vectorize=True,
        seed=0,
        moves=moves.StretchMove(randomize_split=False, pair_mode="roll"),
        scan_unroll=8,
    )
    coords = jax.random.normal(
        jax.random.key(1), (args.walkers, args.ndim)
    )
    # Warm up + burn in (also compiles the chunk shapes).
    state = sampler.run_mcmc(coords, 50, skip_initial_state_check=True)
    sampler.reset()

    t0 = time.perf_counter()
    sampler.run_mcmc(state, args.steps, thin_by=args.thin_by)
    # Stored-chain path already synced through host transfers.
    dt = time.perf_counter() - t0

    # get_autocorr_time already multiplies by the storage thinning.
    tau = sampler.get_autocorr_time(quiet=True) * args.thin_by
    tau_max = float(np.max(tau))
    proposals_per_sec = args.steps * args.thin_by / dt
    ess_per_sec = args.walkers * proposals_per_sec / tau_max

    print(
        json.dumps(
            {
                "metric": "effective_samples_per_sec",
                "value": round(ess_per_sec, 1),
                "unit": "samples/s",
                "tau_max": round(tau_max, 2),
                "proposals_per_sec": round(proposals_per_sec, 2),
                "note": (
                    "includes chain storage to host (the tunneled dev "
                    "env caps device->host at ~8 MB/s; real hardware "
                    "is PCIe-speed)"
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
