"""Workload 5: hierarchical astro-style posterior, 1e3+ dims, sharded.

A toy hierarchical model flattened to ndim = K latents + 2 population
globals, with a separable log-posterior (each latent pinned near its
noisy observation, globals near their hyperprior) so the shard-local
partial-sum contract is exact.  The parameter axis shards over a 2-D
(walkers, params) mesh; the framework completes each walker's log-prob
with a psum over parameter shards.

Run on CPU for a functional demo:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/05_hierarchical_sharded.py
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from emcee_tpu import EnsembleSampler, moves

K = 1022                     # latents
ndim = K + 2                 # + population mean, log-sigma
nwalkers = 4096
nsteps = 200

MU_TRUE, LOGSIG_TRUE, NOISE = 3.0, 0.0, 0.5

rng = np.random.default_rng(0)
_latents = MU_TRUE + np.exp(LOGSIG_TRUE) * rng.normal(size=K)
_obs = _latents + NOISE * rng.normal(size=K)
# Global per-dimension target vector: latents near observations, globals
# near their hyperprior values.
TARGET = jnp.asarray(
    np.concatenate([_obs, [MU_TRUE, LOGSIG_TRUE]]), dtype=jnp.float32
)


def partial_log_prob(x):
    """(nw_local, nd_local) -> shard-local partial log-prob sums.

    When the parameter axis is sharded, each shard sees a contiguous
    block of dims and slices the matching block of the target; the
    unsharded case (initial evaluation) sees the full vector.
    """
    nd_local = x.shape[-1]
    if nd_local == ndim:
        target = TARGET
    else:
        shard = jax.lax.axis_index("params")
        target = jax.lax.dynamic_slice(
            TARGET, (shard * nd_local,), (nd_local,)
        )
    return -0.5 * jnp.sum((x - target[None, :]) ** 2, axis=-1)


def main():
    ndev = len(jax.devices())
    wshards = max(1, ndev // 2)
    pshards = ndev // wshards
    devs = np.array(jax.devices()[: wshards * pshards]).reshape(
        wshards, pshards
    )
    mesh = Mesh(devs, ("walkers", "params"))
    print(f"mesh: {wshards} walker shards x {pshards} param shards")

    sampler = EnsembleSampler(
        nwalkers,
        ndim,
        partial_log_prob,
        vectorize=True,
        seed=0,
        mesh=mesh,
        param_axis="params",
        moves=moves.DEMove(),
    )
    p0 = np.asarray(TARGET)[None, :] + 0.5 * np.random.default_rng(
        1
    ).normal(size=(nwalkers, ndim)).astype(np.float32)
    sampler.run_mcmc(p0, nsteps, progress=True)

    chain = np.asarray(sampler.get_chain(flat=True, discard=nsteps // 2))
    err = np.abs(chain[:, :K].mean(0) - _obs).mean()
    print("mean |latent - obs|:", err)
    print("acceptance:", float(sampler.acceptance_fraction.mean()))

    # Same posterior through the param-sharded gradient path: MALA's
    # gradient is computed from each shard's local partial log-prob (no
    # extra communication) and mixes far faster per proposal at 1e3 dims.
    mala = EnsembleSampler(
        nwalkers,
        ndim,
        partial_log_prob,
        vectorize=True,
        seed=1,
        mesh=mesh,
        param_axis="params",
        moves=moves.MALAMove(0.35),
    )
    mala.run_mcmc(p0, max(nsteps // 4, 10), progress=True)
    mchain = np.asarray(mala.get_chain(flat=True, discard=5))
    merr = np.abs(mchain[:, :K].mean(0) - _obs).mean()
    print("MALA mean |latent - obs|:", merr)
    print("MALA acceptance:", float(mala.acceptance_fraction.mean()))


if __name__ == "__main__":
    main()
