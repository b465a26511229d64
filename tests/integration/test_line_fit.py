"""Line-fit tutorial workload (BASELINE.json workload 2).

The reference's ``docs/tutorials/line.ipynb``: fit (m, b, log f) to data
with underestimated errors; 32 walkers; reference tau ~= [39.2, 40.0, 35.9]
and posterior medians near the truth (m=-0.9594, b=4.294, log f=log 0.534).
Blobs carry the per-sample log-prior as in the blobs tutorial.
"""

import jax
import jax.numpy as jnp
import numpy as np

from emcee_tpu import EnsembleSampler


def make_data(seed=123, N=50):
    rng = np.random.default_rng(seed)
    m_true, b_true, f_true = -0.9594, 4.294, 0.534
    x = np.sort(10 * rng.uniform(size=N))
    yerr = 0.1 + 0.5 * rng.uniform(size=N)
    y = m_true * x + b_true
    y += np.abs(f_true * y) * rng.normal(size=N)
    y += yerr * rng.normal(size=N)
    return x, y, yerr


def test_line_fit_posterior():
    x, y, yerr = make_data()
    xj, yj, yerrj = map(jnp.asarray, (x, y, yerr))

    def log_prob(theta):
        m, b, log_f = theta[0], theta[1], theta[2]
        in_bounds = (
            (-5.0 < m) & (m < 0.5)
            & (0.0 < b) & (b < 10.0)
            & (-10.0 < log_f) & (log_f < 1.0)
        )
        model = m * xj + b
        sigma2 = yerrj**2 + jnp.exp(2 * log_f) * model**2
        log_like = -0.5 * jnp.sum(
            (yj - model) ** 2 / sigma2 + jnp.log(sigma2)
        )
        lp = jnp.where(in_bounds, log_like, -jnp.inf)
        return lp, lp  # blob: the log posterior itself

    nwalkers, ndim = 32, 3
    # Start near the maximum-likelihood point, like the tutorial.
    p0 = np.array([-1.0, 4.5, -0.7]) + 1e-4 * np.random.default_rng(
        0
    ).normal(size=(nwalkers, ndim))

    sampler = EnsembleSampler(nwalkers, ndim, log_prob, seed=42)
    sampler.run_mcmc(p0, 5000)

    tau = sampler.get_autocorr_time(quiet=True)
    assert np.all(tau < 80), f"tau too large: {tau}"

    discard = int(5 * tau.max())
    flat = sampler.get_chain(flat=True, discard=discard, thin=10)
    med = np.percentile(flat, 50, axis=0)
    # Posterior medians close to truth (tutorial corner plot).
    assert abs(med[0] - (-0.9594)) < 0.15, f"m median {med[0]}"
    assert abs(med[1] - 4.294) < 0.6, f"b median {med[1]}"
    assert abs(med[2] - np.log(0.534)) < 0.3, f"log_f median {med[2]}"

    blobs = sampler.get_blobs(flat=True, discard=discard, thin=10)
    lp = sampler.get_log_prob(flat=True, discard=discard, thin=10)
    np.testing.assert_allclose(blobs, lp, rtol=1e-5)
