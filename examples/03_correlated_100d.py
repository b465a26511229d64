"""Workload 3: 100D correlated Gaussian, DE+Snooker mixture, 1e4 walkers.

High-dimensional correlated target where the stretch move struggles; the
DE(0.8) + Snooker(0.2) mixture of the emcee moves tutorial mixes far
better.  At this scale the ensemble lives comfortably on one chip; add
``mesh=walker_mesh()`` to span several.
"""

import jax
import jax.numpy as jnp
import numpy as np

from emcee_tpu import EnsembleSampler, moves

ndim, nwalkers, nsteps = 100, 10_000, 2_000


def main():
    rng = np.random.default_rng(7)
    # Correlated covariance with condition number ~1e2.
    A = rng.normal(size=(ndim, ndim)) / np.sqrt(ndim)
    cov = A @ A.T + 0.1 * np.eye(ndim)
    prec = jnp.asarray(np.linalg.inv(cov), dtype=jnp.float32)

    def log_prob(x):  # vectorized: one MXU matmul for the whole batch
        return -0.5 * jnp.einsum("wi,ij,wj->w", x, prec, x)

    p0 = rng.normal(size=(nwalkers, ndim)).astype(np.float32)
    sampler = EnsembleSampler(
        nwalkers,
        ndim,
        log_prob,
        vectorize=True,
        moves=[(moves.DEMove(), 0.8), (moves.DESnookerMove(), 0.2)],
        seed=3,
        scan_unroll=8,
        # Draw the move once per 16 kept steps: blocks run as pure-move
        # scans with no lax.switch dispatch in the hot loop (moves.md).
        mixture_block=16,
    )
    sampler.run_mcmc(p0, nsteps, progress=True)

    acc = sampler.acceptance_fraction
    print("acceptance:", float(acc.mean()))
    flat = sampler.get_chain(flat=True, discard=nsteps // 2, thin=5)
    emp = np.cov(flat[:, :10], rowvar=False)
    err = np.linalg.norm(emp - cov[:10, :10]) / np.linalg.norm(
        cov[:10, :10]
    )
    print("covariance error (first 10 dims):", err)


if __name__ == "__main__":
    main()
