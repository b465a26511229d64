"""Headline benchmark: walker-steps/sec/chip on the BASELINE.json workload.

Workload: 5D unit Gaussian, 1e5 walkers, StretchMove (the north-star config
from BASELINE.json).  Prints ONE JSON line.

``vs_baseline``: the reference publishes no hardware benchmarks
(BASELINE.md); the only documented throughput anchor for a cheap model is
the interpreted-Python ceiling of ~140 it/s at 32 walkers = 4,480
walker-steps/s (monitor.ipynb, reference ``docs/tutorials/monitor.ipynb``).
We report our measured walker-steps/s/chip divided by that anchor.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from emcee_tpu import EnsembleSampler, State, moves

BASELINE_WALKER_STEPS_PER_SEC = 140.0 * 32.0  # reference monitor.ipynb anchor


def main():
    nwalkers, ndim = 100_000, 5
    nsteps_warm, nsteps = 4, 64

    def log_prob(x):
        return -0.5 * jnp.sum(x**2, axis=-1)

    sampler = EnsembleSampler(
        nwalkers, ndim, log_prob, vectorize=True, seed=0
    )
    coords = jax.random.normal(jax.random.key(1), (nwalkers, ndim))
    state = sampler._prepare_state(
        State(coords, random_state=jax.random.key(2)), True
    )
    carries = sampler._init_carries()

    run = sampler._get_run_chunk(nsteps_warm, 1, False, False, None)
    st, c, _ = run(state, carries)
    jax.block_until_ready(st.coords)

    run = sampler._get_run_chunk(nsteps, 1, False, False, None)
    # Warm the timed-shape compile too.
    st, c, _ = run(state, carries)
    jax.block_until_ready(st.coords)

    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        st, c, _ = run(st, c)
    jax.block_until_ready(st.coords)
    dt = time.perf_counter() - t0

    steps_per_sec = reps * nsteps / dt
    walker_steps_per_sec = steps_per_sec * nwalkers
    print(
        json.dumps(
            {
                "metric": "walker_steps_per_sec_per_chip",
                "value": round(walker_steps_per_sec, 1),
                "unit": "walker-steps/s",
                "vs_baseline": round(
                    walker_steps_per_sec / BASELINE_WALKER_STEPS_PER_SEC, 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
