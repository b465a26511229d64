"""Backend equivalence and persistence tests (reference ``test_backends.py``)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emcee_tpu import EnsembleSampler, State, backends


def normal_log_prob(params):
    return -0.5 * jnp.sum(params**2)


def normal_log_prob_blobs(params):
    return -0.5 * jnp.sum(params**2), params


def _run(backend, nsteps=20, seed=1234, blobs=False, thin_by=1):
    nwalkers, ndim = 16, 3
    coords = np.asarray(
        jax.random.normal(jax.random.key(seed), (nwalkers, ndim))
    )
    lp = normal_log_prob_blobs if blobs else normal_log_prob
    sampler = EnsembleSampler(
        nwalkers, ndim, lp, backend=backend, seed=seed
    )
    sampler.run_mcmc(
        State(jnp.asarray(coords), random_state=jax.random.key(seed + 1)),
        nsteps,
        thin_by=thin_by,
    )
    return sampler


def test_memory_vs_hdf_equivalence():
    """Identical seeded runs must store identical values in both backends."""
    mem = backends.Backend()
    s1 = _run(mem)
    with backends.TempHDFBackend() as hdf:
        s2 = _run(hdf)
        np.testing.assert_allclose(
            s1.get_chain(), s2.get_chain(), rtol=1e-12
        )
        np.testing.assert_allclose(
            s1.get_log_prob(), s2.get_log_prob(), rtol=1e-12
        )
        np.testing.assert_array_equal(
            s1.backend.accepted, s2.backend.accepted
        )
        assert s1.iteration == s2.iteration


def test_hdf_reload_roundtrip():
    """A re-opened HDF file restores chain, iteration, and RNG key."""
    with backends.TempHDFBackend() as hdf:
        s1 = _run(hdf)
        chain1 = s1.get_chain()
        last1 = s1.get_last_sample()

        reopened = backends.HDFBackend(hdf.filename, hdf.name)
        assert reopened.initialized
        assert reopened.iteration == 20
        np.testing.assert_allclose(np.asarray(reopened.get_chain()), chain1)
        last2 = reopened.get_last_sample()
        np.testing.assert_allclose(
            np.asarray(last2.coords), np.asarray(last1.coords)
        )
        np.testing.assert_array_equal(
            jax.random.key_data(last2.random_state),
            jax.random.key_data(last1.random_state),
        )


def test_hdf_restart_continuation_matches_memory():
    """Resuming from a reloaded HDF backend == uninterrupted run."""
    nwalkers, ndim = 16, 3
    coords = np.asarray(
        jax.random.normal(jax.random.key(0), (nwalkers, ndim))
    )
    start = State(jnp.asarray(coords), random_state=jax.random.key(99))

    s_full = EnsembleSampler(
        nwalkers, ndim, normal_log_prob, backend=backends.Backend(), seed=7
    )
    s_full.run_mcmc(start, 20)

    with backends.TempHDFBackend() as hdf:
        s_a = EnsembleSampler(
            nwalkers, ndim, normal_log_prob, backend=hdf, seed=7
        )
        s_a.run_mcmc(start, 10)

        # New sampler over the same file: auto-resumes.
        reopened = backends.HDFBackend(hdf.filename, hdf.name)
        s_b = EnsembleSampler(
            nwalkers, ndim, normal_log_prob, backend=reopened, seed=7
        )
        s_b.run_mcmc(None, 10)
        np.testing.assert_allclose(
            s_full.get_chain(),
            np.asarray(s_b.get_chain()),
            rtol=1e-10,
        )


def test_hdf_multiple_named_groups():
    with backends.TempHDFBackend() as hdf:
        _run(hdf)
        second = backends.HDFBackend(hdf.filename, "run2")
        _run(second, seed=4321)
        assert backends.HDFBackend(hdf.filename, hdf.name).iteration == 20
        assert second.iteration == 20
        chains_differ = not np.allclose(
            np.asarray(backends.HDFBackend(hdf.filename, hdf.name).get_chain()),
            np.asarray(second.get_chain()),
        )
        assert chains_differ


def test_hdf_blobs():
    with backends.TempHDFBackend() as hdf:
        s = _run(hdf, blobs=True)
        blobs = s.get_blobs()
        assert np.shape(blobs) == (20, 16, 3)
        last = s.get_last_sample()
        np.testing.assert_allclose(
            np.asarray(last.blobs), np.asarray(blobs)[-1]
        )


def test_hdf_blobs_multileaf_structured():
    """Multi-leaf blob pytrees land as one structured dataset with one
    field per leaf, and get_last_sample rebuilds the pytree kind."""

    def lp(x):
        return -0.5 * jnp.sum(x**2), jnp.sum(x), x * 2.0

    with backends.TempHDFBackend() as hdf:
        nwalkers, ndim = 16, 3
        coords = np.asarray(
            jax.random.normal(jax.random.key(0), (nwalkers, ndim))
        )
        s = EnsembleSampler(nwalkers, ndim, lp, backend=hdf, seed=0)
        s.run_mcmc(coords, 12)

        import h5py

        with h5py.File(hdf.filename, "r") as f:
            ds = f["test"]["blobs"]
            assert isinstance(ds, h5py.Dataset)
            assert ds.shape == (12, nwalkers)
            assert ds.dtype.names == ("blob0", "blob1")
        raw = s.get_value("blobs")
        assert raw.dtype.names == ("blob0", "blob1")
        assert raw["blob1"].shape == (12, nwalkers, ndim)

        last = s.get_last_sample()
        assert isinstance(last.blobs, tuple) and len(last.blobs) == 2
        np.testing.assert_allclose(
            np.asarray(last.blobs[1]), raw["blob1"][-1]
        )
        # Resume must accept the rebuilt blob pytree.
        s.run_mcmc(None, 3)
        assert s.iteration == 15


def test_hdf_dict_blobs_fields_named_by_key():
    def lp(x):
        return -0.5 * jnp.sum(x**2), {"s": jnp.sum(x), "v": x}

    with backends.TempHDFBackend() as hdf:
        coords = np.asarray(jax.random.normal(jax.random.key(0), (16, 3)))
        s = EnsembleSampler(16, 3, lp, backend=hdf, seed=0)
        s.run_mcmc(coords, 6)
        raw = s.get_value("blobs")
        assert set(raw.dtype.names) == {"s", "v"}
        last = s.get_last_sample()
        assert set(last.blobs) == {"s", "v"}
        s.run_mcmc(None, 2)
        assert s.iteration == 8


@pytest.mark.parametrize("use_hdf", [False, True])
def test_blobs_dtype_structured_fetch(use_hdf):
    """Declared blobs_dtype names the fields of get_blobs' output on both
    backends, including the flat=True path."""
    dt = [("logl", np.float64), ("mean", np.float64)]

    def lp(x):
        return -0.5 * jnp.sum(x**2), -0.5 * jnp.sum(x**2), jnp.mean(x)

    def check(s):
        blobs = s.get_blobs()
        assert blobs.dtype.names == ("logl", "mean")
        assert blobs.shape == (10, 16)
        flatb = s.get_blobs(flat=True)
        assert flatb.shape == (160,)
        np.testing.assert_allclose(
            flatb["logl"], blobs["logl"].reshape(-1)
        )

    coords = np.asarray(jax.random.normal(jax.random.key(2), (16, 3)))
    if use_hdf:
        with backends.TempHDFBackend() as hdf:
            s = EnsembleSampler(
                16, 3, lp, backend=hdf, blobs_dtype=dt, seed=0
            )
            s.run_mcmc(coords, 10)
            check(s)
    else:
        s = EnsembleSampler(16, 3, lp, blobs_dtype=dt, seed=0)
        s.run_mcmc(coords, 10)
        check(s)


def test_hdf_save_chunk_grows_unprompted():
    """save_chunk on an un-grown file must extend capacity and lay out blob
    storage itself (the mid-run grow path), without leaking handles."""
    with backends.TempHDFBackend() as hdf:
        hdf.reset(4, 2)
        k, nw, nd = 5, 4, 2
        rng = np.random.default_rng(0)
        blobs = (rng.normal(size=(k, nw)), rng.normal(size=(k, nw, nd)))
        key = jax.random.key(0)
        hdf.save_chunk(
            rng.normal(size=(k, nw, nd)),
            rng.normal(size=(k, nw)),
            blobs,
            np.ones((k, nw), dtype=bool),
            key,
        )
        assert hdf.iteration == k
        raw = hdf.get_value("blobs")
        assert raw.shape == (k, nw)
        assert raw["blob1"].shape == (k, nw, nd)
        # A second unprompted chunk grows again and appends.
        hdf.save_chunk(
            rng.normal(size=(k, nw, nd)),
            rng.normal(size=(k, nw)),
            blobs,
            np.zeros((k, nw), dtype=bool),
            key,
        )
        assert hdf.iteration == 2 * k
        assert hdf.get_value("chain").shape == (2 * k, nw, nd)
        np.testing.assert_array_equal(hdf.accepted, [k] * nw)


def test_hdf_compression_smoke():
    with backends.TempHDFBackend(compression="gzip") as hdf:
        s = _run(hdf)
        assert s.get_chain().shape == (20, 16, 3)


def test_backend_shape_incompatibility_raises():
    mem = backends.Backend()
    _run(mem)
    with pytest.raises(ValueError):
        EnsembleSampler(8, 2, normal_log_prob, backend=mem, seed=0)


def test_save_step_compat():
    """Single-step save path used by external drivers."""
    be = backends.Backend()
    be.reset(4, 2)
    state = State(
        coords=jnp.zeros((4, 2)),
        log_prob=jnp.zeros(4),
        random_state=jax.random.key(0),
    )
    be.grow(3, None)
    for _ in range(3):
        be.save_step(state, np.array([True, False, True, False]))
    assert be.iteration == 3
    np.testing.assert_array_equal(be.accepted, [3, 0, 3, 0])


def test_inconsistent_blob_use_rejected(tmp_path):
    """Reference parity (backend.py:158-162): a store's blob structure
    is fixed by the first save — continuing blob-ful with blob-less (or
    vice versa) raises instead of leaving uninitialized rows."""
    from emcee_tpu.backends import Backend, DeviceBackend, HDFBackend

    def cases():
        yield Backend()
        yield DeviceBackend()
        yield HDFBackend(str(tmp_path / "incons.h5"))

    for b in cases():
        b.reset(4, 2)
        coords = np.zeros((2, 4, 2))
        lp = np.zeros((2, 4))
        acc = np.zeros((2, 4), np.int32)
        b.save_chunk(coords, lp, np.ones((2, 4), np.float32), acc, None)
        with pytest.raises(ValueError, match="inconsistent use of blobs"):
            b.save_chunk(coords, lp, None, acc, None)
        # and the reverse on a fresh blob-less store
        b2 = type(b)(str(tmp_path / "incons2.h5")) if isinstance(
            b, HDFBackend
        ) else type(b)()
        b2.reset(4, 2)
        b2.save_chunk(coords, lp, None, acc, None)
        with pytest.raises(ValueError, match="inconsistent use of blobs"):
            b2.save_chunk(
                coords, lp, np.ones((2, 4), np.float32), acc, None
            )


def test_grow_respects_blob_consistency(tmp_path):
    """grow() enforces the same precondition as save_chunk: a pre-grow
    whose blob template flips has_blobs must raise, not allocate an
    uninitialized prefix the later save-check then waves through."""
    from emcee_tpu.backends import Backend, HDFBackend

    for b in (Backend(), HDFBackend(str(tmp_path / "g.h5"))):
        b.reset(4, 2)
        coords = np.zeros((2, 4, 2))
        lp = np.zeros((2, 4))
        acc = np.zeros((2, 4), np.int32)
        b.save_chunk(coords, lp, None, acc, None)  # blob-less prefix
        with pytest.raises(ValueError, match="inconsistent use of blobs"):
            b.grow(5, np.zeros((4,), np.float32))


def test_blobful_continuation_of_blobless_chain_rejected(tmp_path):
    """End-to-end: a model that STARTS returning blobs cannot continue a
    blob-less chain (the stored prefix has no blob rows)."""
    from emcee_tpu.backends import HDFBackend

    path = str(tmp_path / "nb2b.h5")

    def lp_nb(x):
        return -0.5 * jnp.sum(x**2)

    coords = np.asarray(jax.random.normal(jax.random.key(1), (8, 2)))
    s1 = EnsembleSampler(8, 2, lp_nb, backend=HDFBackend(path), seed=0)
    s1.run_mcmc(coords, 4)

    def lp_b(x):
        return -0.5 * jnp.sum(x**2), jnp.sum(x)

    s2 = EnsembleSampler(8, 2, lp_b, backend=HDFBackend(path), seed=0)
    with pytest.raises(ValueError, match="inconsistent use of blobs"):
        s2.run_mcmc(None, 3)
