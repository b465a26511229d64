"""Device-resident production loop: store in HBM, monitor on device,
drain to disk.

On TPU the device->host link is often the slowest wire in the system.
This example keeps the whole production run on the chip:

* the chain lands in a :class:`DeviceBackend` (HBM) — no per-chunk
  device->host stream;
* convergence is checked from the device-resident chain
  (``get_autocorr_time`` runs the batched FFT estimator on device);
* once converged, the chain is drained once into an emcee-compatible
  HDF5 file (the only bulk transfer of the run).

Pattern to compare: the reference monitor tutorial streams every step to
an HDF backend and recomputes tau on the host
(``/root/reference/docs/tutorials/monitor.ipynb``).
"""

import os
import tempfile

import jax.numpy as jnp
import numpy as np

from emcee_tpu import EnsembleSampler, backends

ndim, nwalkers = 5, 256
check_every = 500
max_rounds = 20


def log_prob(x):
    return -0.5 * jnp.sum(x**2, axis=-1)


def main():
    rng = np.random.default_rng(3)
    p0 = rng.normal(size=(nwalkers, ndim))

    device_store = backends.DeviceBackend()
    sampler = EnsembleSampler(
        nwalkers, ndim, log_prob, vectorize=True,
        backend=device_store, seed=0,
    )

    # Sample in rounds; check tau from the HBM-resident chain each round
    # and stop once the chain is 50*tau long with a stable estimate.
    state, old_tau = p0, np.inf
    for _ in range(max_rounds):
        state = sampler.run_mcmc(state, check_every)
        tau = np.asarray(sampler.get_autocorr_time(tol=0, quiet=True))
        converged = np.all(tau * 50 < sampler.iteration)
        converged &= np.all(np.abs(old_tau - tau) / tau < 0.05)
        print(
            f"iteration {sampler.iteration}: tau_max = {tau.max():.1f}"
            + (" (converged)" if converged else "")
        )
        if converged:
            break
        old_tau = tau

    # One bulk transfer: drain the device chain into an emcee-readable
    # HDF5 file (reference tooling can open it directly).
    path = os.path.join(tempfile.mkdtemp(), "chain.h5")
    hdf = backends.HDFBackend(path)
    hdf.reset(nwalkers, ndim)
    device_store.to_host(hdf)
    print(f"drained {hdf.iteration} steps to {path}")

    burn = int(2 * tau.max())
    flat = np.asarray(hdf.get_chain(discard=burn, flat=True))
    print("posterior mean error:", np.abs(flat.mean(axis=0)).max())
    print("posterior std error:", np.abs(flat.std(axis=0) - 1).max())


if __name__ == "__main__":
    main()
