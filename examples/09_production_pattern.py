"""The production sampling pattern, end to end.

The recommended shape of a real run on TPU, composing the framework's
pieces: (1) MAP-guided walker initialization, (2) an acceptance-tuned
burn-in, (3) ``reset()`` — which keeps the adapted move scales but
clears the stored burn-in, (4) a production run into device-HBM storage
(no device->host stream in the hot loop), monitored until converged,
(5) an incremental drain to a host backend, and (6) a posterior summary
table.  Every stage is the framework's built-in; nothing here is
hand-rolled.
"""

import jax
import jax.numpy as jnp
import numpy as np

from emcee_tpu import (
    ConvergenceMonitor,
    EnsembleSampler,
    backends,
    moves,
    run_until_converged,
    stats,
    utils,
)

nwalkers, ndim = 256, 4
burn_steps, max_steps, check_every = 300, 20_000, 1_000

# A mildly correlated, offset target.
rng = np.random.default_rng(0)
A = rng.normal(size=(ndim, ndim)) / np.sqrt(ndim)
cov = A @ A.T + 0.5 * np.eye(ndim)
icov = np.linalg.inv(cov)
mu = np.array([1.0, -2.0, 0.5, 3.0])


def log_prob(x):
    d = x - jnp.asarray(mu, dtype=x.dtype)
    return -0.5 * d @ jnp.asarray(icov, dtype=x.dtype) @ d


def main():
    # (1) Initialize walkers in a ball around the MAP (utils.find_map
    # runs a jitted multi-start optimizer on the same log-prob).
    starts = np.random.default_rng(1).normal(size=(8, ndim)) * 2.0
    p_map, _ = utils.find_map(log_prob, starts)
    p0 = utils.sample_ball(
        jax.random.key(1), np.asarray(p_map), 0.1 * np.ones(ndim), nwalkers
    )

    # (2) Tuned burn-in: Robbins-Monro drives acceptance to the target.
    sampler = EnsembleSampler(
        nwalkers,
        ndim,
        log_prob,
        moves=moves.StretchMove(tune_target=0.4),
        backend=backends.DeviceBackend(),
        seed=2,
    )
    sampler.run_mcmc(p0, burn_steps, tune=True)
    print("burn-in acceptance:", float(sampler.acceptance_fraction.mean()))

    # (3) reset() clears the stored burn-in but KEEPS the tuned scale
    # (reference move-object semantics).
    sampler.reset()

    # (4) Production, monitored: the built-in driver samples in blocks,
    # estimates tau on device, and stops at tau * 100 < iteration with a
    # stable estimate (None continues from the burn-in end state).
    _, monitor = run_until_converged(
        sampler,
        None,
        max_steps=max_steps,
        check_every=check_every,
        monitor=ConvergenceMonitor(tau_factor=100, dtau_rel=0.02),
    )
    print(f"converged at {sampler.iteration} steps; tau =",
          np.round(monitor.tau, 2))

    # (5) Drain the HBM-resident chain to a host backend (incremental —
    # repeated calls move only rows appended since the last drain).
    host = backends.Backend()
    sampler.backend.to_host(host)
    print("host chain:", host.get_chain().shape)

    # (6) Posterior report.
    report = stats.summary(sampler, discard=sampler.iteration // 4)
    print(report)
    d = report.to_dict()
    means = np.array([d[k]["mean"] for k in report.names])
    assert np.all(np.abs(means - mu) < 0.2), means
    return report


if __name__ == "__main__":
    main()
