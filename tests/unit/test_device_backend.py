"""DeviceBackend (HBM-resident chain store) tests.

Oracle: identical seeded runs through the host ``Backend`` and the
``DeviceBackend`` must expose identical results through the whole read
surface (chain/log_prob/blobs/accepted/last-sample/tau), since the save
path differs only in where the arrays live.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emcee_tpu import EnsembleSampler, State, backends, moves


def lp_blobs(params):
    return -0.5 * jnp.sum(params**2), jnp.sum(params)


def lp(params):
    return -0.5 * jnp.sum(params**2)


def _pair(nsteps=20, blobs=False, thin_by=1, seed=42, **kw):
    """Run the same seeded chain through Backend and DeviceBackend."""
    nwalkers, ndim = 16, 3
    coords = np.asarray(
        jax.random.normal(jax.random.key(seed), (nwalkers, ndim))
    )
    f = lp_blobs if blobs else lp
    out = []
    for backend in (backends.Backend(), backends.DeviceBackend()):
        s = EnsembleSampler(nwalkers, ndim, f, backend=backend, seed=seed)
        s.run_mcmc(
            State(jnp.asarray(coords), random_state=jax.random.key(seed + 1)),
            nsteps,
            thin_by=thin_by,
            **kw,
        )
        out.append(s)
    return out


def test_matches_host_backend():
    s_host, s_dev = _pair()
    assert isinstance(s_dev.get_chain(), jax.Array)
    np.testing.assert_array_equal(
        np.asarray(s_dev.get_chain(), dtype=np.float64), s_host.get_chain()
    )
    np.testing.assert_array_equal(
        np.asarray(s_dev.get_log_prob(), dtype=np.float64),
        s_host.get_log_prob(),
    )
    np.testing.assert_array_equal(
        s_dev.backend.accepted, s_host.backend.accepted
    )
    assert s_dev.iteration == s_host.iteration == 20


def test_slicing_and_flat():
    s_host, s_dev = _pair(nsteps=23)
    for kw in (
        dict(discard=5),
        dict(thin=3),
        dict(discard=4, thin=2),
        dict(flat=True),
        dict(discard=3, thin=2, flat=True),
    ):
        np.testing.assert_array_equal(
            np.asarray(s_dev.get_chain(**kw), dtype=np.float64),
            s_host.get_chain(**kw),
            err_msg=str(kw),
        )
        np.testing.assert_array_equal(
            np.asarray(s_dev.get_log_prob(**kw), dtype=np.float64),
            s_host.get_log_prob(**kw),
            err_msg=str(kw),
        )


def test_blobs_match():
    s_host, s_dev = _pair(blobs=True)
    np.testing.assert_array_equal(
        np.asarray(s_dev.get_blobs(), dtype=np.float64), s_host.get_blobs()
    )
    assert s_dev.backend.has_blobs


def test_last_sample_and_resume():
    s_host, s_dev = _pair(nsteps=10)
    last_h, last_d = s_host.get_last_sample(), s_dev.get_last_sample()
    np.testing.assert_array_equal(
        np.asarray(last_d.coords), np.asarray(last_h.coords)
    )
    np.testing.assert_array_equal(
        jax.random.key_data(last_d.random_state),
        jax.random.key_data(last_h.random_state),
    )
    # run_mcmc(None, n) continuation stays bit-identical to the host run.
    s_host.run_mcmc(None, 10)
    s_dev.run_mcmc(None, 10)
    np.testing.assert_array_equal(
        np.asarray(s_dev.get_chain(), dtype=np.float64), s_host.get_chain()
    )


def test_autocorr_on_device():
    _, s_dev = _pair(nsteps=60)
    tau = s_dev.get_autocorr_time(quiet=True)
    assert np.all(np.isfinite(np.asarray(tau)))


def test_generator_path():
    nwalkers, ndim = 12, 2
    be = backends.DeviceBackend()
    s = EnsembleSampler(nwalkers, ndim, lp, backend=be, seed=3)
    coords = np.random.default_rng(0).normal(size=(nwalkers, ndim))
    state = State(jnp.asarray(coords), random_state=jax.random.key(4))
    for _ in s.sample(state, iterations=5, thin_by=2):
        pass
    assert be.iteration == 5
    assert s.get_chain().shape == (5, nwalkers, ndim)


def test_save_step_compat():
    be = backends.DeviceBackend()
    be.reset(4, 2)
    state = State(
        coords=np.ones((4, 2)),
        log_prob=np.zeros(4),
        random_state=jax.random.key(0),
    )
    be.save_step(state, np.array([1, 0, 1, 1]))
    be.save_step(state, np.array([0, 0, 1, 0]))
    assert be.iteration == 2
    np.testing.assert_array_equal(be.accepted, [1, 0, 2, 1])
    np.testing.assert_array_equal(
        np.asarray(be.get_chain()), np.ones((2, 4, 2))
    )


def test_uninitialized_access_raises():
    be = backends.DeviceBackend()
    be.reset(4, 2)
    with pytest.raises(AttributeError):
        be.get_chain()
    with pytest.raises(AttributeError):
        be.get_last_sample()


def test_reset_clears():
    _, s_dev = _pair(nsteps=5)
    be = s_dev.backend
    be.reset(16, 3)
    assert be.iteration == 0
    assert be.chain is None
    np.testing.assert_array_equal(be.accepted, np.zeros(16))


def test_to_host_roundtrip():
    s_host, s_dev = _pair(nsteps=15, blobs=True)
    host = s_dev.backend.to_host()
    np.testing.assert_array_equal(host.get_chain(), s_host.get_chain())
    np.testing.assert_array_equal(host.get_log_prob(), s_host.get_log_prob())
    np.testing.assert_array_equal(host.get_blobs(), s_host.get_blobs())
    np.testing.assert_array_equal(host.accepted, s_host.backend.accepted)
    assert host.iteration == 15
    # Incremental drain: only the new rows move.
    s_dev.run_mcmc(None, 5)
    host2 = s_dev.backend.to_host(host)
    assert host2.iteration == 20
    s_host.run_mcmc(None, 5)
    np.testing.assert_array_equal(host2.get_chain(), s_host.get_chain())
    np.testing.assert_array_equal(host2.accepted, s_host.backend.accepted)


def test_sharded_run():
    """DeviceBackend under a walker-sharded mesh run."""
    ndev = len(jax.devices())
    if ndev < 2:
        pytest.skip("needs >=2 devices")
    from emcee_tpu.parallel import walker_mesh

    nwalkers, ndim = 8 * ndev, 3
    be = backends.DeviceBackend()
    s = EnsembleSampler(
        nwalkers, ndim, lp, backend=be, seed=5, mesh=walker_mesh()
    )
    coords = np.random.default_rng(1).normal(size=(nwalkers, ndim))
    s.run_mcmc(
        State(jnp.asarray(coords), random_state=jax.random.key(6)), 10
    )
    chain = np.asarray(s.get_chain())
    assert chain.shape == (10, nwalkers, ndim)
    assert np.all(np.isfinite(chain))


def test_accepted_setter_invalidates_cache():
    """Assigning accepted (seeding a new cumulative base) must not serve
    a stale cached total."""
    be = backends.DeviceBackend()
    be.reset(4, 2)
    state = State(
        coords=np.ones((4, 2)),
        log_prob=np.zeros(4),
        random_state=jax.random.key(0),
    )
    be.save_step(state, np.array([1, 0, 1, 1]))
    np.testing.assert_array_equal(be.accepted, [1, 0, 1, 1])  # caches
    be.accepted = np.array([10, 10, 10, 10])
    np.testing.assert_array_equal(be.accepted, [11, 10, 11, 11])
