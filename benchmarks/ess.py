"""Effective-samples/sec benchmark (the second BASELINE headline metric).

Runs the north-star workload (5D Gaussian, 1e5 walkers) with storage on,
estimates the integrated autocorrelation time from the stored chain, and
reports effective samples per second:

    ESS/sec = nwalkers * proposals_per_sec / tau

Usage: python benchmarks/ess.py [--walkers 100000] [--steps 100]
       [--thin-by 20] [--device]
``--device`` stores the chain in HBM (DeviceBackend) instead of
streaming it to the host.  Prints one JSON line.
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

from emcee_tpu import EnsembleSampler, backends, moves


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--walkers", type=int, default=100_000)
    ap.add_argument("--ndim", type=int, default=5)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--thin-by", type=int, default=20)
    ap.add_argument("--device", action="store_true")
    args = ap.parse_args()

    def log_prob(x):
        return -0.5 * jnp.sum(x**2, axis=-1)

    backend = backends.DeviceBackend() if args.device else None
    sampler = EnsembleSampler(
        args.walkers,
        args.ndim,
        log_prob,
        vectorize=True,
        seed=0,
        backend=backend,
        moves=moves.StretchMove(randomize_split=False, pair_mode="roll"),
        scan_unroll=4,
        io_chunk_bytes=1 << 29,
    )
    coords = np.random.default_rng(1).normal(
        size=(args.walkers, args.ndim)
    ).astype(np.float32)

    # Warm-up run with the SAME (steps, thin_by) so the timed run reuses
    # the compiled chunk (a different warm-up shape would leave the
    # compile inside the timing window).  It doubles as burn-in.
    state = sampler.run_mcmc(
        coords, args.steps, thin_by=args.thin_by,
        skip_initial_state_check=True,
    )
    sampler.reset()

    t0 = time.perf_counter()
    state = sampler.run_mcmc(
        state, args.steps, thin_by=args.thin_by,
        skip_initial_state_check=True,
    )
    float(jnp.sum(state.log_prob))  # forced sync (tunneled runtime)
    dt = time.perf_counter() - t0

    # Stored rows are thin_by proposals apart: get_autocorr_time returns
    # tau in kept units; * thin_by converts to proposal units.
    tau = np.asarray(sampler.get_autocorr_time(quiet=True)) * args.thin_by
    tau_max = float(np.max(tau))
    proposals_per_sec = args.steps * args.thin_by / dt
    ess_per_sec = args.walkers * proposals_per_sec / tau_max

    print(
        json.dumps(
            {
                "metric": "effective_samples_per_sec",
                "value": round(ess_per_sec, 1),
                "unit": "samples/s",
                "tau_max_proposals": round(tau_max, 2),
                "proposals_per_sec": round(proposals_per_sec, 2),
                "storage": "device-HBM" if args.device else "host",
                "note": (
                    "host mode includes the device->host chain stream "
                    "(the tunneled dev env caps at ~10-25 MB/s; real "
                    "hardware is PCIe-speed)"
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
