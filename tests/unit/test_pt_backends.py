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


def test_device_matches_memory():
    """PTDeviceBackend: identical seeded run must match the host store
    across the whole read surface."""
    from emcee_tpu.backends.pt import PTDeviceBackend

    m = _run(PTBackend())
    d = _run(PTDeviceBackend())
    assert isinstance(d.get_chain(), jax.Array)
    np.testing.assert_array_equal(
        np.asarray(d.get_chain(), dtype=np.float64), m.get_chain()
    )
    np.testing.assert_array_equal(
        np.asarray(d.get_log_like(), dtype=np.float64), m.get_log_like()
    )
    np.testing.assert_array_equal(
        np.asarray(d.get_log_prior(), dtype=np.float64), m.get_log_prior()
    )
    np.testing.assert_array_equal(d.accepted, m.accepted)
    np.testing.assert_array_equal(d.swaps_accepted, m.swaps_accepted)
    np.testing.assert_array_equal(d.swaps_proposed, m.swaps_proposed)
    np.testing.assert_array_equal(d.betas, m.betas)
    # cold-chain + temp slicing path
    np.testing.assert_array_equal(
        np.asarray(d.get_chain(temp=0, flat=True), dtype=np.float64),
        m.get_chain(temp=0, flat=True),
    )


def test_device_resume_and_lnz():
    from emcee_tpu.backends.pt import PTDeviceBackend

    d = _run(PTDeviceBackend(), nsteps=20)
    full = _run(PTBackend(), nsteps=40)
    d.run_mcmc(None, 20)
    np.testing.assert_array_equal(
        np.asarray(d.get_chain(), dtype=np.float64), full.get_chain()
    )
    lnz_d = d.log_evidence_estimate(discard=10)
    lnz_m = full.log_evidence_estimate(discard=10)
    np.testing.assert_allclose(float(lnz_d), float(lnz_m), rtol=1e-6)


def test_device_to_host_roundtrip(h5file):
    from emcee_tpu.backends.pt import PTDeviceBackend

    d = _run(PTDeviceBackend(), nsteps=15)
    be = d.backend
    host = be.to_host()
    m = _run(PTBackend(), nsteps=15)
    np.testing.assert_array_equal(host.get_chain(), m.get_chain())
    np.testing.assert_array_equal(host.accepted, m.accepted)
    np.testing.assert_array_equal(
        host.swaps_proposed, m.backend.swaps_proposed
    )
    # incremental drain into an HDF PT store
    hdf = PTHDFBackend(h5file)
    hdf.reset(4, 16, 2)
    be.to_host(hdf)
    assert hdf.iteration == 15
    d.run_mcmc(None, 5)
    be.to_host(hdf)
    assert hdf.iteration == 20
    np.testing.assert_array_equal(
        np.asarray(hdf.get_chain()),
        np.asarray(be.get_chain(), dtype=np.float64),
    )


def _chunk(k, T=2, nw=4, nd=3, blobs=None):
    """Minimal save_chunk argument tuple for direct backend tests."""
    return dict(
        coords=np.zeros((k, T, nw, nd)),
        log_like=np.zeros((k, T, nw)),
        log_prior=np.zeros((k, T, nw)),
        accepted=np.zeros((k, T, nw), np.int32),
        swaps_accepted=np.zeros(T - 1, np.int64),
        swaps_proposed=np.zeros(T - 1, np.int64),
        random_state=None,
        betas=np.array([1.0, 0.5]),
        blobs=blobs,
    )


def test_pregrown_backend_allocates_first_blobs():
    """A pre-sized chain must not skip first-time blob allocation:
    grow(n, template) on an already-large-enough store previously
    early-returned with blobs=None and the next save_chunk crashed."""
    b = PTBackend()
    b.reset(2, 4, 3)
    b.grow(10)  # pre-size without blobs
    template = {"s": np.zeros((2, 4), np.float32)}
    b.grow(5, template)  # within capacity; must still allocate blobs
    assert b.blobs is not None and b.blobs["s"].shape == (10, 2, 4)
    b.save_chunk(**_chunk(5, blobs={"s": np.ones((5, 2, 4), np.float32)}))
    assert b.iteration == 5
    np.testing.assert_array_equal(b.get_blobs()["s"], 1.0)


def test_hdf_blob_field_names_validated(h5file):
    """Dict blobs with different keys must be rejected, not silently
    written into the wrong (sorted-name-ordered) fields."""
    b = PTHDFBackend(h5file)
    b.reset(2, 4, 3)
    ok = {
        "a": np.zeros((3, 2, 4), np.float32),
        "b": np.zeros((3, 2, 4), np.float32),
    }
    b.save_chunk(**_chunk(3, blobs=ok))
    bad = {
        "b": np.zeros((2, 2, 4), np.float32),
        "c": np.zeros((2, 2, 4), np.float32),
    }
    with pytest.raises(ValueError, match="field names changed"):
        b.save_chunk(**_chunk(2, blobs=bad))


def test_pt_max_chunk_counts_blob_bytes():
    """io_chunk_bytes must bound the blob buffer too: a data-sized blob
    shrinks the chunk."""
    pt = PTSampler(
        2, 8, 2, log_like, log_prior, seed=0, io_chunk_bytes=1 << 16
    )
    no_blobs = pt._max_chunk()
    big_blob = {"resid": np.zeros((2, 8, 500), np.float64)}
    with_blobs = pt._max_chunk(big_blob)
    assert with_blobs < no_blobs


def test_pt_inconsistent_blob_use_rejected(h5file):
    """Blob-ful tempered stores reject blob-less continuation (and vice
    versa) across all three backends (reference backend.py:158-162)."""
    from emcee_tpu.backends.pt import PTDeviceBackend

    blob = {"s": np.ones((2, 2, 4), np.float32)}
    for b in (PTBackend(), PTDeviceBackend(), PTHDFBackend(h5file)):
        b.reset(2, 4, 3)
        b.save_chunk(**_chunk(2, blobs=blob))
        with pytest.raises(ValueError, match="inconsistent use of blobs"):
            b.save_chunk(**_chunk(2, blobs=None))
