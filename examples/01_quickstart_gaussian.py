"""Workload 1: quickstart 5D multivariate Gaussian, 32 walkers, StretchMove.

The emcee quickstart example (docs/tutorials/quickstart): sample a
correlated 5D Gaussian and report acceptance + integrated autocorrelation
time.
"""

import jax
import jax.numpy as jnp
import numpy as np

from emcee_tpu import EnsembleSampler

ndim, nwalkers, nsteps = 5, 32, 10_000

rng = np.random.default_rng(42)
means = rng.uniform(size=ndim)
A = rng.normal(size=(ndim, ndim))
cov = A @ A.T + ndim * np.eye(ndim)
icov = jnp.asarray(np.linalg.inv(cov), dtype=jnp.float32)
mu = jnp.asarray(means, dtype=jnp.float32)


def log_prob(x):
    d = x - mu
    return -0.5 * d @ icov @ d


def main():
    p0 = rng.normal(size=(nwalkers, ndim))
    sampler = EnsembleSampler(nwalkers, ndim, log_prob, seed=0)
    sampler.run_mcmc(p0, 100)  # burn-in
    state = sampler.get_last_sample()
    sampler.reset()
    sampler.run_mcmc(state, nsteps, progress=True)

    print("acceptance:", float(sampler.acceptance_fraction.mean()))
    tau = sampler.get_autocorr_time(quiet=True)
    print("tau:", tau)
    flat = sampler.get_chain(flat=True, discard=int(2 * tau.max()))
    print("posterior mean error:", np.abs(flat.mean(0) - means).max())


if __name__ == "__main__":
    main()
