"""Workload 2: linear model fit with Gaussian likelihood + blobs.

The emcee line-fit tutorial (docs/tutorials/line): fit (m, b, log f) to
data with underestimated error bars; blobs carry the log-prior.
"""

import jax
import jax.numpy as jnp
import numpy as np

from emcee_tpu import EnsembleSampler

m_true, b_true, f_true = -0.9594, 4.294, 0.534
nwalkers, ndim, nsteps = 32, 3, 5_000


def make_data(N=50, seed=123):
    rng = np.random.default_rng(seed)
    x = np.sort(10 * rng.uniform(size=N))
    yerr = 0.1 + 0.5 * rng.uniform(size=N)
    y = m_true * x + b_true
    y += np.abs(f_true * y) * rng.normal(size=N)
    y += yerr * rng.normal(size=N)
    return map(jnp.asarray, (x, y, yerr))


def main():
    x, y, yerr = make_data()

    def log_prior(theta):
        m, b, log_f = theta
        ok = (
            (-5.0 < m) & (m < 0.5)
            & (0.0 < b) & (b < 10.0)
            & (-10.0 < log_f) & (log_f < 1.0)
        )
        return jnp.where(ok, 0.0, -jnp.inf)

    def log_prob(theta):
        lp = log_prior(theta)
        m, b, log_f = theta
        model = m * x + b
        sigma2 = yerr**2 + jnp.exp(2 * log_f) * model**2
        ll = -0.5 * jnp.sum((y - model) ** 2 / sigma2 + jnp.log(sigma2))
        return lp + jnp.where(jnp.isfinite(lp), ll, 0.0), lp  # blob = prior

    # MAP init, as the reference tutorial does with scipy.optimize —
    # here a jitted optax ascent (utils.find_map) + ball init.
    from emcee_tpu import utils

    theta_map, _ = utils.find_map(
        lambda t: log_prob(t)[0], jnp.array([-1.0, 4.5, -0.7]), steps=3000
    )
    print("MAP:", np.asarray(theta_map))
    p0 = np.asarray(
        utils.sample_ball(
            jax.random.key(7), theta_map, 1e-4 * jnp.ones(ndim), nwalkers
        )
    )

    sampler = EnsembleSampler(nwalkers, ndim, log_prob, seed=42)
    sampler.run_mcmc(p0, nsteps, progress=True)

    tau = sampler.get_autocorr_time(quiet=True)
    print("tau:", tau, "(reference tutorial: ~[39.2, 40.0, 35.9])")
    flat = sampler.get_chain(flat=True, discard=int(5 * tau.max()), thin=10)
    for name, true, col in [
        ("m", m_true, 0),
        ("b", b_true, 1),
        ("log f", np.log(f_true), 2),
    ]:
        lo, med, hi = np.percentile(flat[:, col], [16, 50, 84])
        print(f"{name} = {med:.3f} (+{hi-med:.3f}/-{med-lo:.3f})"
              f"  truth {true:.3f}")


if __name__ == "__main__":
    main()
