"""Randomized contract checks across sampler configurations.

A bounded sweep over (nwalkers, ndim, moves, thinning, storage) asserting
the invariants every configuration must satisfy: stored shapes, finite
chains, acceptance within [0, 1], iteration bookkeeping, and that continuation appends finite rows.  Complements the per-feature suites by
exercising odd shape combinations none of them pick.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emcee_tpu import EnsembleSampler, State, backends, moves


def lp(x):
    return -0.5 * jnp.sum(x**2, axis=-1)


CONFIGS = [
    # (nwalkers, ndim, nsteps, thin_by, moves, backend factory)
    (6, 1, 7, 1, None, backends.Backend),
    (10, 2, 11, 2, moves.GaussianMove(0.5), backends.DeviceBackend),
    (12, 3, 5, 3, moves.DEMove(), backends.Backend),
    (30, 2, 9, 1, moves.WalkMove(), backends.DeviceBackend),
    (14, 2, 8, 1, moves.MALAMove(0.8), backends.Backend),
    (16, 2, 6, 2, moves.HMCMove(0.5, n_leapfrog=3), backends.Backend),
    (18, 3, 10, 1, moves.EnsembleMALAMove(1.0), backends.DeviceBackend),
    (20, 5, 7, 1, moves.StretchMove(nsplits=4), backends.Backend),
    (
        24, 2, 12, 1,
        [(moves.StretchMove(), 0.5), (moves.MALAMove(0.9), 0.5)],
        backends.DeviceBackend,
    ),
    (22, 2, 9, 1, moves.KDEMove(), backends.Backend),
    (16, 2, 8, 1, moves.DESnookerMove(), backends.Backend),  # nsplits=4
    (26, 3, 10, 2, moves.DIMEMove(), backends.DeviceBackend),
    (12, 4, 9, 1, moves.DEZMove(update_rows=4), backends.Backend),
    (
        20, 2, 8, 1,
        [(moves.DIMEMove(df=None), 0.4), (moves.DEZMove(), 0.6)],
        backends.Backend,
    ),
]


@pytest.mark.parametrize(
    "nw,nd,nsteps,thin_by,mv,be", CONFIGS,
    ids=[f"cfg{i}" for i in range(len(CONFIGS))],
)
def test_contract(nw, nd, nsteps, thin_by, mv, be):
    rng = np.random.default_rng(nw * 100 + nd)
    s = EnsembleSampler(
        nw, nd, lp, vectorize=True, moves=mv, backend=be(), seed=nd
    )
    p0 = rng.normal(size=(nw, nd))
    state = s.run_mcmc(
        State(jnp.asarray(p0), random_state=jax.random.key(nw)),
        nsteps,
        thin_by=thin_by,
    )

    chain = np.asarray(s.get_chain())
    assert chain.shape == (nsteps, nw, nd)
    assert np.all(np.isfinite(chain))
    lp_stored = np.asarray(s.get_log_prob())
    assert lp_stored.shape == (nsteps, nw)
    np.testing.assert_allclose(
        lp_stored, -0.5 * np.sum(chain**2, axis=-1), rtol=5e-4, atol=1e-5
    )
    acc = np.asarray(s.acceptance_fraction)
    assert np.all((acc >= 0) & (acc <= 1))
    assert s.iteration == nsteps
    np.testing.assert_array_equal(
        np.asarray(state.coords), chain[-1]
    )

    # Continuation adds exactly the requested rows, finitely.
    s.run_mcmc(None, 3, thin_by=thin_by)
    assert s.iteration == nsteps + 3
    assert np.all(np.isfinite(np.asarray(s.get_chain())))


def _hc_lp_plain(x):
    return -0.5 * float(np.sum(np.asarray(x) ** 2))


def _hc_lp_blob(x):
    x = np.asarray(x)
    return -0.5 * float(np.sum(x**2)), np.float32(x[0])


@pytest.mark.parametrize("blobs_mode", [None, "declared", "auto"])
def test_host_callback_pool_invariance(blobs_mode):
    """The pool is an execution detail: for a fixed host function, the
    chain (and blobs) must be bit-identical across no-pool, thread-pool,
    and executor configurations, for every blob-declaration mode."""
    from concurrent.futures import ThreadPoolExecutor

    fn = _hc_lp_plain if blobs_mode is None else _hc_lp_blob
    spec = {
        None: None,
        "declared": [np.float32],
        "auto": "auto",
    }[blobs_mode]
    p0 = np.random.default_rng(3).normal(size=(8, 2)).astype(np.float32)

    def run(pool):
        s = EnsembleSampler(
            8,
            2,
            fn,
            host_callback=True,
            pool=pool,
            host_callback_blobs=spec,
            seed=7,
        )
        s.run_mcmc(p0, 5)
        return (
            np.asarray(s.get_chain()),
            None if s.get_blobs() is None else np.asarray(s.get_blobs()),
        )

    base_chain, base_blobs = run(None)
    with ThreadPoolExecutor(3) as ex:
        for pool in (2, ex):
            chain, blobs = run(pool)
            np.testing.assert_array_equal(chain, base_chain)
            if base_blobs is None:
                assert blobs is None
            else:
                np.testing.assert_array_equal(blobs, base_blobs)


def _pt_ll(x):
    return -0.5 * jnp.sum(x**2, axis=-1)


def _pt_lp(x):
    return jnp.zeros(x.shape[:-1])


PT_CONFIGS = [
    # (ntemps, nw, nd, nsteps, thin_by, kwargs)
    (3, 8, 2, 6, 2, dict(adaptive=True)),
    (2, 10, 3, 8, 1, dict(io_dtype=np.float16, swap_every=2)),
    (4, 6, 2, 5, 1, dict(mixture_block=1)),
]


@pytest.mark.parametrize(
    "T,nw,nd,nsteps,thin_by,kw", PT_CONFIGS,
    ids=[f"pt{i}" for i in range(len(PT_CONFIGS))],
)
def test_pt_contract(T, nw, nd, nsteps, thin_by, kw):
    """PT invariants across odd config combinations: shapes, finiteness,
    bookkeeping, ladder monotonicity, and finite continuation."""
    import emcee_tpu

    pt = emcee_tpu.PTSampler(
        T, nw, nd, _pt_ll, _pt_lp, vectorize=True, seed=nd, **kw
    )
    c0 = np.asarray(
        jax.random.normal(jax.random.key(T * 10 + nw), (T, nw, nd))
    )
    st = pt.run_mcmc(c0, nsteps, thin_by=thin_by)
    chain = np.asarray(pt.get_chain())
    assert chain.shape == (nsteps, T, nw, nd)
    assert np.all(np.isfinite(chain))
    ll = np.asarray(pt.get_log_like())
    assert ll.shape == (nsteps, T, nw)
    betas = np.asarray(pt.betas)
    assert betas[0] == 1.0 and np.all(np.diff(betas) < 0)
    acc = np.asarray(pt.acceptance_fraction)
    assert np.all((acc >= 0) & (acc <= 1))
    sw = np.asarray(pt.tswap_acceptance_fraction)
    assert np.all((sw >= 0) & (sw <= 1))
    assert pt.backend.iteration == nsteps
    np.testing.assert_allclose(
        np.asarray(st.coords),
        chain[-1].astype(np.asarray(st.coords).dtype),
        rtol=2e-3 if kw.get("io_dtype") is not None else 1e-12,
        atol=2e-3 if kw.get("io_dtype") is not None else 0,
    )
    pt.run_mcmc(None, 2, thin_by=thin_by)
    assert pt.backend.iteration == nsteps + 2
    assert np.all(np.isfinite(np.asarray(pt.get_chain())))
