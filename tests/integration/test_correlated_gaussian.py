"""Correlated-Gaussian workload (scaled-down BASELINE.json workload 3).

The full workload is a 100D correlated Gaussian at 1e4 walkers with a
DE(0.8)+Snooker(0.2) mixture; this CI version shrinks to 16D / 256 walkers
so it runs on the CPU mesh, checking that the sampled covariance matches
the target within Monte-Carlo error.
"""

import jax
import jax.numpy as jnp
import numpy as np

from emcee_tpu import EnsembleSampler, moves


def test_correlated_gaussian_de_mixture():
    ndim, nwalkers = 16, 256
    rng = np.random.default_rng(7)
    # Random SPD covariance with moderate condition number.
    A = rng.normal(size=(ndim, ndim)) / np.sqrt(ndim)
    cov = A @ A.T + 0.5 * np.eye(ndim)
    prec = jnp.asarray(np.linalg.inv(cov), dtype=jnp.float32)

    def log_prob(x):
        return -0.5 * x @ prec @ x

    p0 = rng.normal(size=(nwalkers, ndim))
    sampler = EnsembleSampler(
        nwalkers,
        ndim,
        log_prob,
        moves=[(moves.DEMove(), 0.8), (moves.DESnookerMove(), 0.2)],
        seed=3,
    )
    sampler.run_mcmc(p0, 3000)

    acc = sampler.acceptance_fraction
    assert np.all((acc > 0.05) & (acc < 0.9))

    flat = sampler.get_chain(flat=True, discard=1000, thin=2)
    emp_cov = np.cov(flat, rowvar=False)
    # Relative Frobenius error of the covariance.
    err = np.linalg.norm(emp_cov - cov) / np.linalg.norm(cov)
    assert err < 0.12, f"covariance error {err:.3f}"
    assert np.all(np.abs(flat.mean(0)) < 0.2)
