"""Orbax sharded-state checkpoint tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emcee_tpu import EnsembleSampler, checkpoint
from emcee_tpu.parallel import walker_mesh
from emcee_tpu.parallel.tempering import PTSampler


def log_prob(x):
    return -0.5 * jnp.sum(x**2)


def test_state_roundtrip(tmp_path):
    nw, nd = 16, 2
    s = EnsembleSampler(nw, nd, log_prob, seed=0)
    p0 = np.random.default_rng(0).normal(size=(nw, nd))
    state = s.run_mcmc(p0, 20)

    path = str(tmp_path / "ck")
    checkpoint.save_state(path, state)
    restored = checkpoint.load_state(path, like=state)

    assert type(restored).__name__ == "State"
    np.testing.assert_allclose(
        np.asarray(restored.coords), np.asarray(state.coords)
    )
    np.testing.assert_array_equal(
        jax.random.key_data(restored.random_state),
        jax.random.key_data(state.random_state),
    )
    # A fresh sampler continues from the restored state.
    s2 = EnsembleSampler(nw, nd, log_prob, seed=0)
    s2.run_mcmc(restored, 10)
    assert s2.iteration == 10


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs devices")
def test_sharded_state_roundtrip(tmp_path):
    nw, nd = 64, 2
    mesh = walker_mesh()
    s = EnsembleSampler(nw, nd, log_prob, seed=0, mesh=mesh)
    p0 = np.random.default_rng(0).normal(size=(nw, nd))
    state = s.run_mcmc(p0, 10, store=False)

    path = str(tmp_path / "ck")
    checkpoint.save_state(path, state)
    restored = checkpoint.load_state(path, like=state)
    np.testing.assert_allclose(
        np.asarray(restored.coords), np.asarray(state.coords)
    )
    s.run_mcmc(restored, 5, store=False)


def test_pt_state_roundtrip(tmp_path):
    def ll(x):
        return -0.5 * jnp.sum(x**2)

    def lp(x):
        return 0.0

    T, nw, nd = 4, 16, 2
    pt = PTSampler(T, nw, nd, ll, lp, seed=0)
    coords = jax.random.normal(jax.random.key(0), (T, nw, nd))
    state = pt.run_mcmc(coords, 10)

    path = str(tmp_path / "ck")
    checkpoint.save_state(path, state)
    restored = checkpoint.load_state(path, like=state)
    assert type(restored).__name__ == "PTState"
    np.testing.assert_allclose(
        np.asarray(restored.log_like), np.asarray(state.log_like)
    )
    pt.run_mcmc(restored, 5)
