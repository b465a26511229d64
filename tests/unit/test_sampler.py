"""Sampler contract tests (reference ``tests/unit/test_sampler.py``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import emcee_tpu
from emcee_tpu import EnsembleSampler, State, backends, moves


def normal_log_prob(params):
    return -0.5 * jnp.sum(params**2)


def run_sampler(
    backend,
    nwalkers=32,
    ndim=3,
    nsteps=25,
    seed=1234,
    thin_by=1,
    progress=False,
    store=True,
    log_prob_fn=normal_log_prob,
    move=None,
):
    key = jax.random.key(seed)
    coords = jax.random.normal(key, (nwalkers, ndim))
    sampler = EnsembleSampler(
        nwalkers, ndim, log_prob_fn, backend=backend, seed=seed, moves=move
    )
    sampler.run_mcmc(
        coords, nsteps, thin_by=thin_by, progress=progress, store=store
    )
    return sampler


@pytest.mark.parametrize("backend", backends.get_test_backends())
@pytest.mark.parametrize(
    "moves_arg",
    [
        None,
        moves.GaussianMove(0.5),
        [moves.StretchMove(), moves.GaussianMove(0.5)],
        [(moves.StretchMove(), 0.3), (moves.GaussianMove(0.5), 0.1)],
    ],
)
def test_shapes(backend, moves_arg):
    nwalkers, ndim, nsteps = 32, 3, 25

    def check(be):
        sampler = run_sampler(be, nsteps=nsteps, move=moves_arg)
        chain = sampler.get_chain()
        assert chain.shape == (nsteps, nwalkers, ndim)
        assert sampler.get_log_prob().shape == (nsteps, nwalkers)
        assert sampler.acceptance_fraction.shape == (nwalkers,)
        assert sampler.iteration == nsteps
        flat = sampler.get_chain(flat=True)
        assert flat.shape == (nsteps * nwalkers, ndim)

    if backend is backends.TempHDFBackend:
        with backend() as be:
            check(be)
    else:
        check(backend())


def test_errors_uninitialized_access():
    sampler = EnsembleSampler(10, 2, normal_log_prob, seed=0)
    with pytest.raises(AttributeError):
        sampler.get_chain()


def test_errors_shape_mismatch():
    sampler = EnsembleSampler(10, 2, normal_log_prob, seed=0)
    coords = np.zeros((10, 3))
    with pytest.raises(ValueError):
        sampler.run_mcmc(coords, 5)


def test_errors_dependent_walkers():
    sampler = EnsembleSampler(10, 2, normal_log_prob, seed=0)
    coords = np.ones((10, 2))  # fully degenerate ensemble
    with pytest.raises(ValueError):
        sampler.run_mcmc(coords, 5)
    # skip_initial_state_check bypasses the guard
    sampler.run_mcmc(
        coords + 1e-8 * np.random.default_rng(0).normal(size=(10, 2)),
        2,
        skip_initial_state_check=True,
    )


def test_errors_nan_log_prob():
    def bad(params):
        return jnp.nan

    sampler = EnsembleSampler(10, 2, bad, seed=0)
    coords = np.random.default_rng(0).normal(size=(10, 2))
    with pytest.raises(ValueError):
        sampler.run_mcmc(coords, 5)


def test_errors_infinite_coords():
    sampler = EnsembleSampler(10, 2, normal_log_prob, seed=0)
    coords = np.random.default_rng(0).normal(size=(10, 2))
    coords[0, 0] = np.inf
    with pytest.raises(ValueError):
        sampler.run_mcmc(coords, 5)


def test_thin_by():
    """thin_by=k chain == every-k subsample in expectation of shapes."""
    nsteps, thin_by = 20, 3
    sampler = run_sampler(None, nsteps=nsteps, thin_by=thin_by)
    assert sampler.get_chain().shape == (nsteps, 32, 3)
    assert sampler.iteration == nsteps


def test_thin_by_matches_unthinned():
    """Same key: thin_by=k must reproduce every k-th unthinned sample."""
    nwalkers, ndim = 16, 2
    coords = np.asarray(
        jax.random.normal(jax.random.key(5), (nwalkers, ndim))
    )
    key = jax.random.key(7)
    s1 = EnsembleSampler(nwalkers, ndim, normal_log_prob, seed=0)
    s1.run_mcmc(State(jnp.asarray(coords), random_state=key), 12)
    s2 = EnsembleSampler(nwalkers, ndim, normal_log_prob, seed=0)
    s2.run_mcmc(State(jnp.asarray(coords), random_state=key), 4, thin_by=3)
    c1 = s1.get_chain()
    c2 = s2.get_chain()
    np.testing.assert_allclose(c1[2::3], c2, rtol=1e-6)


def test_restart_continuation():
    sampler = run_sampler(None, nsteps=10)
    state1 = sampler.get_last_sample()
    sampler.run_mcmc(None, 10)
    assert sampler.iteration == 20
    chain = sampler.get_chain()
    np.testing.assert_allclose(chain[9], np.asarray(state1.coords))


def test_restart_requires_history():
    sampler = EnsembleSampler(10, 2, normal_log_prob, seed=0)
    with pytest.raises(ValueError):
        sampler.run_mcmc(None, 5)


def test_vectorize():
    def vec_log_prob(x):
        return -0.5 * jnp.sum(x**2, axis=-1)

    nwalkers, ndim = 16, 2
    sampler = EnsembleSampler(
        nwalkers, ndim, vec_log_prob, vectorize=True, seed=0
    )
    coords = np.random.default_rng(0).normal(size=(nwalkers, ndim))
    sampler.run_mcmc(coords, 10)
    assert sampler.get_chain().shape == (10, nwalkers, ndim)


def test_host_callback_log_prob():
    """Non-JAX (numpy) log-prob via the pure_callback escape hatch."""

    def np_log_prob(x):
        return -0.5 * float(np.sum(np.asarray(x) ** 2))

    nwalkers, ndim = 16, 2
    sampler = EnsembleSampler(
        nwalkers, ndim, np_log_prob, host_callback=True, seed=0
    )
    coords = np.random.default_rng(0).normal(size=(nwalkers, ndim))
    sampler.run_mcmc(coords, 10)
    lp = sampler.get_log_prob()
    expected = -0.5 * np.sum(sampler.get_chain() ** 2, axis=-1)
    np.testing.assert_allclose(lp, expected, rtol=1e-5)


def test_infinite_generator():
    sampler = EnsembleSampler(16, 2, normal_log_prob, seed=0)
    coords = np.random.default_rng(0).normal(size=(16, 2))
    gen = sampler.sample(coords, iterations=None, store=False)
    for i, state in enumerate(gen):
        if i >= 5:
            break
    assert state.coords.shape == (16, 2)
    with pytest.raises(ValueError):
        next(sampler.sample(coords, iterations=None, store=True))


def test_generator_yields():
    sampler = EnsembleSampler(16, 2, normal_log_prob, seed=0)
    coords = np.random.default_rng(0).normal(size=(16, 2))
    n = 0
    for state in sampler.sample(coords, iterations=7):
        n += 1
        assert isinstance(state, State)
    assert n == 7
    assert sampler.iteration == 7


def test_determinism():
    """Fixed seed => bit-identical chains across runs."""
    s1 = run_sampler(None, nsteps=15, seed=42)
    s2 = run_sampler(None, nsteps=15, seed=42)
    np.testing.assert_array_equal(s1.get_chain(), s2.get_chain())


def test_run_mcmc_resume_matches_single_run():
    """10 + 10 steps with resume == 20 steps in one call."""
    nwalkers, ndim = 16, 2
    coords = np.asarray(
        jax.random.normal(jax.random.key(3), (nwalkers, ndim))
    )
    key = jax.random.key(11)

    s1 = EnsembleSampler(nwalkers, ndim, normal_log_prob, seed=0)
    s1.run_mcmc(State(jnp.asarray(coords), random_state=key), 20)

    s2 = EnsembleSampler(nwalkers, ndim, normal_log_prob, seed=0)
    s2.run_mcmc(State(jnp.asarray(coords), random_state=key), 10)
    s2.run_mcmc(None, 10)

    np.testing.assert_allclose(
        s1.get_chain(), s2.get_chain(), rtol=1e-6
    )


def test_walkers_independent_properties():
    """Property suite mirroring reference test_sampler.py:237-321."""
    rng = np.random.default_rng(0)
    # Constant ensembles and too-few walkers are dependent.
    assert not emcee_tpu.walkers_independent(np.ones((10, 2)))
    assert not emcee_tpu.walkers_independent(rng.normal(size=(2, 3)))
    # Random ensembles are independent, including under large offsets.
    base = rng.normal(size=(30, 10))
    assert emcee_tpu.walkers_independent(base)
    for offset in [1e5, 1e10, 1e14]:
        assert emcee_tpu.walkers_independent(base + offset)
    # ... but not past float64 precision.
    assert not emcee_tpu.walkers_independent(
        base + 10 / np.finfo(float).eps
    )
    # Projecting away one direction makes the ensemble dependent, even when
    # only squashed to 1e-8 of its original extent.
    p = rng.normal(size=10)
    p /= np.linalg.norm(p)
    proj = np.sum(p[None, :] * base, axis=1)[:, None] * p[None, :]
    assert not emcee_tpu.walkers_independent(base - proj)
    assert not emcee_tpu.walkers_independent(base - proj + 1e-8 * proj)
    # Mixed scales (overflow-if-squared) are fine.
    scales = np.array([1, 1e10, 1e100, 1e200, 1e-10, 1e-100, 1e-200])
    w = rng.normal(size=(35, 7)) * scales[None, :]
    assert emcee_tpu.walkers_independent(w)
    # Non-finite coordinates are not independent.
    bad = base.copy()
    bad[0, 0] = np.inf
    assert not emcee_tpu.walkers_independent(bad)


def test_pool_warns():
    with pytest.warns(UserWarning):
        EnsembleSampler(10, 2, normal_log_prob, pool=object(), seed=0)


def test_named_parameters():
    def lp(params):
        return -0.5 * (params["x"] ** 2 + jnp.sum(params["y"] ** 2))

    nwalkers, ndim = 16, 3
    sampler = EnsembleSampler(
        nwalkers,
        ndim,
        lp,
        parameter_names={"x": 0, "y": [1, 2]},
        seed=0,
    )
    coords = np.random.default_rng(0).normal(size=(nwalkers, ndim))
    sampler.run_mcmc(coords, 10)
    assert sampler.get_chain().shape == (10, nwalkers, ndim)
    expected = -0.5 * np.sum(sampler.get_chain() ** 2, axis=-1)
    np.testing.assert_allclose(sampler.get_log_prob(), expected, rtol=1e-5)


def test_named_parameters_list():
    def lp(params):
        return -0.5 * (params["a"] ** 2 + params["b"] ** 2)

    sampler = EnsembleSampler(
        16, 2, lp, parameter_names=["a", "b"], seed=0
    )
    coords = np.random.default_rng(0).normal(size=(16, 2))
    sampler.run_mcmc(coords, 10)
    assert sampler.get_chain().shape == (10, 16, 2)


def test_reset():
    sampler = run_sampler(None, nsteps=10)
    assert sampler.iteration == 10
    sampler.reset()
    assert sampler.iteration == 0
    with pytest.raises(AttributeError):
        sampler.get_chain()


def test_pickling():
    """Sampler round-trips through pickle (reference test_sampler.py:225-234).

    The jitted chunk caches are dropped and rebuilt lazily; module-level
    log-prob functions keep the sampler picklable.
    """
    import pickle

    sampler = run_sampler(None, nsteps=5)
    blob = pickle.dumps(sampler)
    clone = pickle.loads(blob)
    np.testing.assert_array_equal(
        clone.get_chain(), sampler.get_chain()
    )
    # The clone can keep sampling.
    clone.run_mcmc(None, 5)
    assert clone.iteration == 10


def test_deprecated_v2_properties_and_random_state():
    """Reference v3 keeps the v2-era attribute shims (ensemble.py:560-595)
    and a random_state property; drop-in users get the same here."""
    import warnings

    sampler = run_sampler(None, nsteps=10)
    with warnings.catch_warnings():
        warnings.simplefilter("error", DeprecationWarning)
        import pytest as _pytest

        with _pytest.warns(DeprecationWarning):
            chain = sampler.chain
    assert chain.shape[1] == 10  # (nwalkers, steps, ndim) v2 layout
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        assert sampler.flatchain.shape[0] == chain.shape[0] * 10
        assert sampler.lnprobability.shape[1] == 10
    key = sampler.random_state
    assert key is not None
    sampler.random_state = jax.random.key(42)
    np.testing.assert_array_equal(
        jax.random.key_data(sampler.random_state),
        jax.random.key_data(jax.random.key(42)),
    )


def test_pickling_with_gradient_move():
    """Gradient moves (incl. a full-cov preconditioner) survive the
    sampler pickle round-trip."""
    import pickle

    cov = np.array([[2.0, 0.3], [0.3, 1.0]])
    s = EnsembleSampler(
        16, 2, normal_log_prob, seed=0,
        moves=moves.MALAMove(0.8, cov=cov),
    )
    coords = np.random.default_rng(0).normal(size=(16, 2))
    s.run_mcmc(coords, 5)
    s2 = pickle.loads(pickle.dumps(s))
    s2.run_mcmc(None, 5)
    assert s2.get_chain().shape[0] == 10  # backend state survives pickle
    assert np.all(np.isfinite(np.asarray(s2.get_chain())))


def test_io_dtype_casts_stored_chain():
    """io_dtype compresses only the *stored* copies: chain coords (and
    float blob leaves) land in the requested dtype while the live state
    and log_prob stay full precision, and the chain statistics match the
    full-precision run to float16 resolution."""
    nwalkers, ndim, nsteps = 32, 3, 40
    coords = np.asarray(
        jax.random.normal(jax.random.key(3), (nwalkers, ndim))
    )

    def lp_with_blobs(x):
        lp = -0.5 * jnp.sum(x**2)
        return lp, (2.0 * lp, jnp.int32(1))

    def run(io_dtype):
        s = EnsembleSampler(
            nwalkers,
            ndim,
            lp_with_blobs,
            seed=7,
            backend=backends.Backend(
                dtype=np.float16 if io_dtype else None
            ),
            io_dtype=io_dtype,
        )
        state = s.run_mcmc(coords, nsteps)
        return s, state

    s16, state16 = run(np.float16)
    s32, state32 = run(None)

    assert s16.backend.chain.dtype == np.float16
    blob16 = s16.get_blobs()
    assert blob16[0].dtype == np.float16  # float leaf compressed
    assert blob16[1].dtype == np.int32  # non-float leaf untouched
    # Live state keeps full precision regardless of io_dtype.
    assert state16.coords.dtype == state32.coords.dtype
    assert state16.log_prob.dtype == state32.log_prob.dtype
    # Same chain up to the storage cast (identical keys -> identical
    # trajectories; only the stored copy is rounded).
    np.testing.assert_allclose(
        np.asarray(s16.get_chain(), dtype=np.float64),
        np.asarray(s32.get_chain(), dtype=np.float64),
        rtol=0,
        atol=2e-2,
    )


def test_io_dtype_rejects_non_float():
    with pytest.raises(ValueError, match="floating"):
        EnsembleSampler(8, 2, normal_log_prob, io_dtype=np.int32)


def test_interrupted_run_keeps_completed_chunks():
    """A KeyboardInterrupt mid-run flushes every completed chunk to the
    backend and leaves the sampler resumable via run_mcmc(None, n)."""
    nwalkers, ndim = 32, 3
    coords = np.asarray(
        jax.random.normal(jax.random.key(5), (nwalkers, ndim))
    )
    # ~640 B/step -> 5 kept steps per chunk -> schedule [5, 5, 5, 5].
    s = EnsembleSampler(
        nwalkers, ndim, normal_log_prob, seed=11, io_chunk_bytes=3200
    )
    orig = s._get_run_chunk
    calls = {"n": 0}

    def interrupting(*a, **k):
        calls["n"] += 1
        if calls["n"] == 3:
            raise KeyboardInterrupt
        return orig(*a, **k)

    s._get_run_chunk = interrupting
    with pytest.raises(KeyboardInterrupt):
        s.run_mcmc(coords, 20)

    saved = s.backend.iteration
    assert saved == 10  # two completed 5-step chunks, incl. the pending one
    assert np.all(np.isfinite(s.get_chain()))

    s._get_run_chunk = orig
    s.run_mcmc(None, 20 - saved)
    assert s.backend.iteration == 20
    assert s.get_chain().shape == (20, nwalkers, ndim)


def test_io_dtype_resume_upcasts():
    """Resuming from a reduced-precision store must not continue the
    chain in float16: coords upcast and log_prob is recomputed from the
    rounded coords (a stale full-precision log_prob would bias accepts)."""
    nwalkers, ndim = 16, 2
    coords = np.asarray(
        jax.random.normal(jax.random.key(8), (nwalkers, ndim))
    )
    backend = backends.Backend(dtype=np.float16)
    s = EnsembleSampler(
        nwalkers, ndim, normal_log_prob, seed=5, backend=backend,
        io_dtype=np.float16,
    )
    s.run_mcmc(coords, 10)

    # Fresh sampler over the same backend (crash-recovery pattern).
    s2 = EnsembleSampler(
        nwalkers, ndim, normal_log_prob, seed=5, backend=backend,
        io_dtype=np.float16,
    )
    last = s2._previous_state
    assert np.asarray(last.coords).dtype == np.float16  # stored rounded
    state = s2.run_mcmc(None, 5)
    assert state.coords.dtype == np.float32  # sampling stayed f32
    # log_prob consistent with the rounded restart coords: all finite and
    # the chain keeps sampling sensibly.
    assert np.all(np.isfinite(np.asarray(state.log_prob)))
    assert s2.backend.iteration == 15


def test_interrupt_inside_save_keeps_chain_consistent():
    """Regression: a KeyboardInterrupt landing inside _save_chunk (the
    window where nearly all wall-clock is spent) must leave the stored
    chain and the resume anchors mutually consistent — resuming must
    reproduce exactly the chain an uninterrupted run would have stored."""
    nwalkers, ndim, nsteps = 32, 3, 20
    coords = np.asarray(
        jax.random.normal(jax.random.key(9), (nwalkers, ndim))
    )

    def make():
        return EnsembleSampler(
            nwalkers, ndim, normal_log_prob, seed=13, io_chunk_bytes=3200
        )  # ~5 kept steps per chunk -> schedule [5, 5, 5, 5]

    ref = make()
    ref.run_mcmc(coords, nsteps)
    ref_chain = np.asarray(ref.get_chain())

    s = make()
    orig_save = s._save_chunk
    calls = {"n": 0}

    def interrupting_save(*a, **k):
        calls["n"] += 1
        if calls["n"] == 2:
            raise KeyboardInterrupt  # mid-save: chunk 2 aborts
        return orig_save(*a, **k)

    s._save_chunk = interrupting_save
    with pytest.raises(KeyboardInterrupt):
        s.run_mcmc(coords, nsteps)
    s._save_chunk = orig_save

    saved = s.backend.iteration
    assert saved == 5  # only chunk 1 landed; anchors point there too
    s.run_mcmc(None, nsteps - saved)
    assert s.backend.iteration == nsteps
    # Identical to the uninterrupted run: no gap, no duplicate.
    np.testing.assert_array_equal(np.asarray(s.get_chain()), ref_chain)


def test_pickling_with_adaptive_moves():
    """DIME/DEZ adaptation state (moment matrices, the archive ring)
    lives in device-array carries; it must survive the sampler pickle
    round-trip so a checkpointed production run resumes adapted."""
    import pickle

    s = EnsembleSampler(
        32, 2, normal_log_prob, seed=6,
        moves=[
            (moves.DIMEMove(), 0.5),
            (moves.DEZMove(update_rows=8), 0.5),
        ],
    )
    coords = np.random.default_rng(3).normal(size=(32, 2))
    s.run_mcmc(coords, 40)
    w_before = float(s._move_carries[0]["w"])
    filled_before = int(s._move_carries[1]["filled"])
    assert w_before > 0 and filled_before > 0

    s2 = pickle.loads(pickle.dumps(s))
    assert float(s2._move_carries[0]["w"]) == w_before
    assert int(s2._move_carries[1]["filled"]) == filled_before
    np.testing.assert_array_equal(
        np.asarray(s2._move_carries[1]["z"]),
        np.asarray(s._move_carries[1]["z"]),
    )
    s2.run_mcmc(None, 10)  # adaptation continues from the restored carry
    assert float(s2._move_carries[0]["w"]) > w_before
    assert s2.backend.iteration == 50


def test_reference_import_path_aliases():
    """Reference-style module paths resolve to the same objects:
    ``emcee.ensemble`` / ``emcee.moves.move`` equivalents."""
    import emcee_tpu
    from emcee_tpu.ensemble import EnsembleSampler as ES
    from emcee_tpu.ensemble import walkers_independent
    from emcee_tpu.moves.move import Move

    assert ES is emcee_tpu.EnsembleSampler
    assert Move is emcee_tpu.moves.Move
    assert callable(walkers_independent)
    from emcee_tpu.interruptible_pool import InterruptiblePool
    from multiprocessing.pool import Pool

    assert InterruptiblePool is Pool
    from emcee_tpu.mpi_pool import MPIPool  # import resolves either way

    assert MPIPool is not None


def test_deprecated_thin_argument():
    """Reference back-compat: ``thin=`` counts proposals and warns;
    equivalent to ``thin_by=thin`` with ``n // thin`` kept steps."""
    import warnings as _w

    def lp(x):
        return -0.5 * jnp.sum(x**2)

    coords = np.asarray(
        jax.random.normal(jax.random.key(3), (12, 2))
    )
    a = emcee_tpu.EnsembleSampler(12, 2, lp, seed=5)
    with _w.catch_warnings():
        _w.simplefilter("error")  # any unexpected warning -> fail
        _w.filterwarnings("always", category=DeprecationWarning)
        with pytest.warns(DeprecationWarning, match="'thin'"):
            a.run_mcmc(coords, 20, thin=4)
    b = emcee_tpu.EnsembleSampler(12, 2, lp, seed=5)
    b.run_mcmc(coords, 5, thin_by=4)
    np.testing.assert_array_equal(
        np.asarray(a.get_chain()), np.asarray(b.get_chain())
    )
    assert a.get_chain().shape[0] == 5


def test_deprecated_constructor_args_warn_and_ignore():
    """Reference semantics (ensemble.py:93-113): v2-era constructor
    arguments warn and are ignored."""
    import warnings as _w

    def lp(x):
        return -0.5 * jnp.sum(x**2)

    with pytest.warns(DeprecationWarning, match="'a'.*moves"):
        s = emcee_tpu.EnsembleSampler(8, 2, lp, a=3.0, seed=0)
    with pytest.warns(DeprecationWarning, match="'threads'"):
        emcee_tpu.EnsembleSampler(8, 2, lp, threads=4, seed=0)
    # ignored: default StretchMove still in effect
    assert type(s._moves[0]).__name__ == "StretchMove"


def test_chunk_cap_lifts_without_host_transfer():
    """The kept-steps-per-dispatch cap is 4096 on the host-transfer
    path, 16384 when chunks never leave the device (store=False or a
    DeviceBackend), and max_chunk_steps= overrides both — so the
    headline-bench operating point is reachable via run_mcmc."""
    nwalkers, ndim = 8, 2
    st = State(jnp.zeros((nwalkers, ndim)), log_prob=jnp.zeros(nwalkers))
    s = EnsembleSampler(nwalkers, ndim, normal_log_prob, seed=0)
    assert s._auto_chunk(st, 1, store=True) == 4096
    assert s._auto_chunk(st, 1, store=False) == 16384
    dev = EnsembleSampler(
        nwalkers, ndim, normal_log_prob, seed=0,
        backend=backends.DeviceBackend(),
    )
    assert dev._auto_chunk(st, 1, store=True) == 16384
    over = EnsembleSampler(
        nwalkers, ndim, normal_log_prob, seed=0, max_chunk_steps=100
    )
    assert over._auto_chunk(st, 1, store=True) == 100
    assert over._auto_chunk(st, 1, store=False) == 100
    with pytest.raises(ValueError, match="max_chunk_steps"):
        EnsembleSampler(
            nwalkers, ndim, normal_log_prob, seed=0, max_chunk_steps=0
        )
    # io_chunk_bytes still bounds the host-transfer path.
    tiny = EnsembleSampler(
        nwalkers, ndim, normal_log_prob, seed=0, io_chunk_bytes=1024
    )
    bytes_per_step = (
        st.coords.size * st.coords.dtype.itemsize
        + st.log_prob.size * st.log_prob.dtype.itemsize
        + nwalkers * 4
    )
    assert tiny._auto_chunk(st, 1, store=True) == max(
        1, 1024 // bytes_per_step
    )


def test_max_chunk_steps_run_and_pickle_roundtrip():
    import pickle

    s = EnsembleSampler(
        8, 2, normal_log_prob, seed=3, max_chunk_steps=7
    )
    coords = jax.random.normal(jax.random.key(3), (8, 2))
    s.run_mcmc(coords, 20)
    assert s.get_chain().shape == (20, 8, 2)
    assert s.last_run_stats.chunks >= 3
    s2 = pickle.loads(pickle.dumps(s))
    assert s2._max_chunk_steps == 7


def test_accurate_timing_opt_in():
    s = EnsembleSampler(8, 2, normal_log_prob, seed=4)
    coords = jax.random.normal(jax.random.key(4), (8, 2))
    s.run_mcmc(coords, 5)
    assert s.last_run_stats.accurate is False
    s.run_mcmc(None, 5, accurate_timing=True)
    assert s.last_run_stats.accurate is True
    assert s.last_run_stats.walltime_s > 0.0
    assert s.get_chain().shape == (10, 8, 2)
