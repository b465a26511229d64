"""Statistical end-to-end sampling harness.

Port of the reference's integration oracle
(``/root/reference/src/emcee/tests/integration/test_proposal.py:31-102``):
sample a unit normal, assert the acceptance-fraction window, posterior
moment error bounds, and a K-S test; plus the inverse sanity check that a
normal chain fails a uniform K-S test.  Same tolerances as the reference CI.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

try:
    from scipy import stats
except ImportError:
    stats = None

import emcee_tpu

__all__ = ["_test_normal", "_test_uniform"]


def normal_log_prob(params):
    return -0.5 * jnp.sum(params**2)


def normal_log_prob_blobs(params):
    return -0.5 * jnp.sum(params**2), params


def _test_normal(
    proposal,
    ndim=1,
    nwalkers=32,
    nsteps=2000,
    seed=1234,
    check_acceptance=True,
    blobs=False,
    mesh=None,
    prng=None,
    **sampler_kwargs,
):
    key = jax.random.key(seed)
    coords = jax.random.normal(key, (nwalkers, ndim))

    lp = normal_log_prob_blobs if blobs else normal_log_prob
    sampler = emcee_tpu.EnsembleSampler(
        nwalkers,
        ndim,
        lp,
        moves=proposal,
        seed=seed,
        mesh=mesh,
        prng=prng,
        **sampler_kwargs,
    )
    sampler.run_mcmc(coords, nsteps)

    if check_acceptance:
        acc = sampler.acceptance_fraction
        assert np.all(
            (acc < 0.9) * (acc > 0.1)
        ), "Invalid acceptance fraction\n{0}".format(acc)

    samps = np.asarray(sampler.get_chain(flat=True))
    mu, sig = np.mean(samps, axis=0), np.std(samps, axis=0)
    assert np.all(np.abs(mu) < 0.08), f"Incorrect mean: {mu}"
    assert np.all(np.abs(sig - 1) < 0.05), f"Incorrect standard deviation: {sig}"

    if ndim == 1 and stats is not None:
        ks, _ = stats.kstest(samps[:, 0], "norm")
        assert ks < 0.05, "The K-S test failed"


def _test_uniform(proposal, nwalkers=32, nsteps=2000, seed=1234):
    key = jax.random.key(seed)
    coords = jax.random.uniform(key, (nwalkers, 1))

    sampler = emcee_tpu.EnsembleSampler(
        nwalkers, 1, normal_log_prob, moves=proposal, seed=seed
    )
    sampler.run_mcmc(coords, nsteps)

    acc = sampler.acceptance_fraction
    assert np.all(
        (acc < 0.9) * (acc > 0.1)
    ), "Invalid acceptance fraction\n{0}".format(acc)

    if stats is not None:
        samps = np.asarray(sampler.get_chain(flat=True))
        np.random.default_rng(seed).shuffle(samps)
        ks, _ = stats.kstest(samps[::100, 0], "uniform")
        assert ks > 0.1, "The K-S test failed"
