"""Workload 4: multimodal posterior with 16-temperature parallel tempering.

A widely-separated Gaussian mixture (plus a Rosenbrock-style valley in the
first two dims) that a single-temperature ensemble cannot cross; the
tempering ladder flattens it and even/odd swaps carry walkers between
modes.  Reports mode occupation and the thermodynamic-integration lnZ.
"""

import jax
import jax.numpy as jnp
import numpy as np

from emcee_tpu import PTSampler

ntemps, nwalkers, ndim, nsteps = 16, 64, 2, 4_000


def log_like(x):
    # Two well-separated modes with a curved (banana) component.
    m1 = -0.5 * jnp.sum((x - 4.0) ** 2) * 4.0
    banana = -0.5 * (
        (x[0] + 4.0) ** 2 + 25.0 * (x[1] + 4.0 - 0.2 * (x[0] + 4.0) ** 2) ** 2
    )
    return jnp.logaddexp(m1, banana)


def log_prior(x):
    return jnp.where(jnp.all(jnp.abs(x) < 15.0), 0.0, -jnp.inf)


def main():
    pt = PTSampler(
        ntemps, nwalkers, ndim, log_like, log_prior, seed=0
    )
    coords = jax.random.uniform(
        jax.random.key(1), (ntemps, nwalkers, ndim), minval=-10, maxval=10
    )
    pt.run_mcmc(coords, nsteps)

    chain0 = pt.get_chain(temp=0, discard=nsteps // 4, flat=True)
    frac_right = float((chain0[:, 0] > 0).mean())
    print("cold-chain mode occupation (right mode):", frac_right)
    print("swap acceptance per rung pair:", pt.tswap_acceptance_fraction)
    print("lnZ estimate:", pt.log_evidence_estimate(discard=nsteps // 4))
    print("tau (cold):", pt.get_autocorr_time(
        discard=nsteps // 4, quiet=True
    ))


if __name__ == "__main__":
    main()
