"""PT backend persistence tests: HDF round-trip and crash-resume."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emcee_tpu.backends.pt import PTBackend, PTHDFBackend
from emcee_tpu.parallel.tempering import PTSampler


def log_like(x):
    return -0.5 * jnp.sum(x**2)


def log_prior(x):
    return jnp.where(jnp.all(jnp.abs(x) < 10.0), 0.0, -jnp.inf)


@pytest.fixture
def h5file(tmp_path):
    return str(tmp_path / "pt.h5")


def _run(backend, nsteps=30, seed=0, T=4, nw=16, nd=2, start_key=7):
    pt = PTSampler(
        T, nw, nd, log_like, log_prior, seed=seed, backend=backend
    )
    coords = jax.random.normal(jax.random.key(start_key), (T, nw, nd))
    pt.run_mcmc(coords, nsteps)
    return pt


def test_hdf_matches_memory(h5file):
    m = _run(PTBackend())
    h = _run(PTHDFBackend(h5file))
    np.testing.assert_allclose(m.get_chain(), h.get_chain(), rtol=1e-12)
    np.testing.assert_allclose(
        m.get_log_like(), h.get_log_like(), rtol=1e-12
    )
    np.testing.assert_array_equal(m.accepted, h.accepted)
    np.testing.assert_array_equal(m.swaps_accepted, h.swaps_accepted)
    np.testing.assert_array_equal(m.swaps_proposed, h.swaps_proposed)


def test_hdf_resume_matches_uninterrupted(h5file):
    T, nw, nd = 4, 16, 2
    full = _run(PTBackend(), nsteps=40)

    _run(PTHDFBackend(h5file), nsteps=20)
    # Fresh sampler on the same file: auto-resume from disk.
    pt2 = PTSampler(
        T, nw, nd, log_like, log_prior, seed=0,
        backend=PTHDFBackend(h5file),
    )
    assert pt2.iteration == 20
    pt2.run_mcmc(None, 20)
    assert pt2.iteration == 40
    np.testing.assert_allclose(
        full.get_chain(), pt2.get_chain(), rtol=1e-6
    )


def test_last_sample_roundtrip(h5file):
    pt = _run(PTHDFBackend(h5file), nsteps=10)
    last = pt.get_last_sample()
    np.testing.assert_allclose(
        np.asarray(last.coords), pt.get_chain()[-1]
    )
    assert last.random_state is not None


def test_swap_bookkeeping_accumulates():
    pt = _run(PTBackend(), nsteps=20)
    p1 = pt.swaps_proposed.copy()
    pt.run_mcmc(None, 20)
    assert np.all(pt.swaps_proposed >= p1)
    assert pt.swaps_proposed.sum() > 0
    frac = pt.tswap_acceptance_fraction
    assert np.all((frac >= 0) & (frac <= 1))
