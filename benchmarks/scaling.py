"""Weak-scaling benchmark: walker-steps/s/chip vs device count.

Weak scaling holds walkers-per-device constant and grows the mesh; the
BASELINE target is >= 0.8 efficiency at 1e5 walkers across a v5e-16.
On a single-chip environment this measures 1-chip throughput and (with
JAX_PLATFORMS=cpu + --xla_force_host_platform_device_count=N) validates
the scaling *machinery* on a virtual CPU mesh.

Usage:
    python benchmarks/scaling.py [--walkers-per-device 12500] [--ndim 5]
        [--steps 64] [--devices 1 2 4 8]

Prints one JSON line per mesh size:
    {"devices": N, "walker_steps_per_sec": ..., "per_chip": ...,
     "efficiency_vs_1": ...}
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

from emcee_tpu import EnsembleSampler, State, moves
from emcee_tpu.parallel import walker_mesh


def measure(n_devices, walkers_per_device, ndim, nsteps, unroll=8):
    nwalkers = walkers_per_device * n_devices
    mesh = walker_mesh(n_devices) if n_devices > 1 else None

    def log_prob(x):
        return -0.5 * jnp.sum(x**2, axis=-1)

    sampler = EnsembleSampler(
        nwalkers,
        ndim,
        log_prob,
        vectorize=True,
        seed=0,
        mesh=mesh,
        moves=moves.StretchMove(randomize_split=False),
        scan_unroll=unroll,
    )
    coords = jax.random.normal(jax.random.key(1), (nwalkers, ndim))
    state = sampler._prepare_state(
        State(coords, random_state=jax.random.key(2)), True
    )
    carries = sampler._init_carries()
    run = sampler._get_run_chunk(nsteps, 1, False, False, None)
    st, c, _ = run(state, carries)
    np.asarray(st.coords)  # forced fetch (see docs/performance.md)

    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        st, c, _ = run(st, c)
    np.asarray(st.coords)
    dt = time.perf_counter() - t0
    return reps * nsteps * nwalkers / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--walkers-per-device", type=int, default=12_500)
    ap.add_argument("--ndim", type=int, default=5)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument(
        "--devices", type=int, nargs="*", default=None,
        help="mesh sizes to test (default: 1,2,4,... up to available)",
    )
    args = ap.parse_args()

    ndev_avail = len(jax.devices())
    sizes = args.devices
    if not sizes:
        sizes, n = [], 1
        while n <= ndev_avail:
            sizes.append(n)
            n *= 2

    base = None
    for n in sizes:
        if n > ndev_avail:
            break
        ws = measure(n, args.walkers_per_device, args.ndim, args.steps)
        per_chip = ws / n
        if base is None:
            base = per_chip
        print(
            json.dumps(
                {
                    "devices": n,
                    "walker_steps_per_sec": round(ws, 1),
                    "per_chip": round(per_chip, 1),
                    "efficiency_vs_1": round(per_chip / base, 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
