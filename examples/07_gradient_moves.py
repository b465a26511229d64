"""Gradient-based sampling: MALA and HMC via JAX autodiff.

The reference is gradient-free by construction (numpy log-probs have no
derivatives); here the log-prob is a JAX function, so Langevin and
Hamiltonian proposals come free and dominate the effective-samples/sec
metric on smooth targets (docs/performance.md).  This example samples a
correlated Gaussian with HMC and compares its integrated autocorrelation
time against the stretch move.
"""

import jax
import jax.numpy as jnp
import numpy as np

from emcee_tpu import EnsembleSampler, moves

ndim, nwalkers, nsteps = 10, 64, 2000


def main():
    rng = np.random.default_rng(7)
    A = rng.normal(size=(ndim, ndim)) / np.sqrt(ndim)
    cov = A @ A.T + 0.5 * np.eye(ndim)
    icov = jnp.asarray(np.linalg.inv(cov), dtype=jnp.float32)

    def log_prob(x):
        return -0.5 * x @ icov @ x

    p0 = rng.normal(size=(nwalkers, ndim)) @ np.linalg.cholesky(cov).T

    taus = {}
    for name, mv in [
        ("stretch", moves.StretchMove()),
        # jitter breaks trajectory-length resonances; tune_target adapts
        # the step size toward the HMC operating range during burn-in.
        ("hmc", moves.HMCMove(0.2, n_leapfrog=8, jitter=0.2,
                              tune_target=0.7)),
        ("mala", moves.MALAMove(0.3, tune_target=0.574)),
        # Affine-invariant members: the complement group's covariance is
        # the metric / mass matrix — nothing to tune even on correlated
        # targets (the ensemble supplies the geometry).
        ("e-mala", moves.EnsembleMALAMove(1.0)),
        ("e-hmc", moves.EnsembleHMCMove(0.5, n_leapfrog=4)),
    ]:
        sampler = EnsembleSampler(nwalkers, ndim, log_prob, moves=mv, seed=0)
        state = sampler.run_mcmc(p0, nsteps // 4, tune=True)  # tuned burn-in
        sampler.reset()  # keeps the adapted step size and the ensemble
        sampler.run_mcmc(None, nsteps)
        tau = float(np.max(np.asarray(sampler.get_autocorr_time(quiet=True))))
        acc = float(np.mean(sampler.acceptance_fraction))
        taus[name] = tau
        print(f"{name:8s} tau_max = {tau:6.1f}  acceptance = {acc:.2f}")

        flat = np.asarray(sampler.get_chain(flat=True, discard=nsteps // 10))
        err = np.linalg.norm(np.cov(flat, rowvar=False) - cov) / np.linalg.norm(cov)
        print(f"{'':8s} covariance error = {err:.1%}")

    print(f"\nHMC mixes {taus['stretch'] / taus['hmc']:.0f}x faster than "
          "stretch on this target (per proposal).")


if __name__ == "__main__":
    main()
