"""Parallel-tempering tests (BASELINE.json workload 4 coverage).

The reference removed PTSampler in v3 (``ptsampler.py`` shim); these tests
cover the rebuilt capability: a bimodal target that plain ensemble moves
cannot mix across must be sampled with correct mode weights, swap
acceptance must be healthy, and the ladder/statistics bookkeeping sound.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emcee_tpu import moves
from emcee_tpu.parallel import walker_mesh
from emcee_tpu.parallel.tempering import (
    PTSampler,
    PTState,
    default_beta_ladder,
)


def log_like_bimodal(x):
    a = -0.5 * jnp.sum((x - 5.0) ** 2)
    b = -0.5 * jnp.sum((x + 5.0) ** 2)
    return jnp.logaddexp(a, b)


def log_prior_box(x):
    return jnp.where(jnp.all(jnp.abs(x) < 20.0), 0.0, -jnp.inf)


def test_beta_ladder():
    betas = default_beta_ladder(8, 5)
    assert betas[0] == 1.0
    assert np.all(np.diff(betas) < 0)
    betas2 = default_beta_ladder(8, 5, max_temp=100.0)
    assert np.isclose(betas2[-1], 1.0 / 100.0)


def test_bimodal_mode_hopping():
    T, nw, nd = 8, 32, 1
    pt = PTSampler(T, nw, nd, log_like_bimodal, log_prior_box, seed=0)
    coords = jax.random.uniform(
        jax.random.key(1), (T, nw, nd), minval=-10, maxval=10
    )
    pt.run_mcmc(coords, 2000)
    chain0 = pt.get_chain(temp=0, discard=500, flat=True)
    frac_pos = (chain0 > 0).mean()
    # Without tempering, walkers stay in their initial mode; with working
    # swaps the two symmetric modes are equally occupied.
    assert abs(frac_pos - 0.5) < 0.1
    assert abs(np.abs(chain0).mean() - 5.0) < 0.2
    # Swap acceptance should be moderate (ladder neither too coarse/fine).
    tswap = pt.tswap_acceptance_fraction
    assert np.all(tswap > 0.2) and np.all(tswap <= 1.0)


def test_shapes_and_bookkeeping():
    T, nw, nd = 4, 16, 2
    pt = PTSampler(T, nw, nd, log_like_bimodal, log_prior_box, seed=0)
    coords = jax.random.normal(jax.random.key(0), (T, nw, nd))
    state = pt.run_mcmc(coords, 50)
    assert isinstance(state, PTState)
    assert pt.get_chain().shape == (50, T, nw, nd)
    assert pt.get_chain(temp=1).shape == (50, nw, nd)
    assert pt.acceptance_fraction.shape == (T, nw)
    assert pt.iteration == 50
    assert np.all(np.isfinite(pt.get_chain()))


def test_resume():
    T, nw, nd = 4, 16, 2
    pt = PTSampler(T, nw, nd, log_like_bimodal, log_prior_box, seed=0)
    coords = jax.random.normal(jax.random.key(0), (T, nw, nd))
    pt.run_mcmc(coords, 20)
    pt.run_mcmc(None, 20)
    assert pt.get_chain().shape == (40, T, nw, nd)


def test_single_temperature_matches_plain_sampling():
    """ntemps=1, beta=1 reduces to plain ensemble sampling of a normal."""
    nw, nd = 32, 2

    def ll(x):
        return -0.5 * jnp.sum(x**2)

    def lp(x):
        return 0.0

    pt = PTSampler(1, nw, nd, ll, lp, betas=[1.0], seed=3)
    coords = jax.random.normal(jax.random.key(2), (1, nw, nd))
    pt.run_mcmc(coords, 2000)
    chain = pt.get_chain(temp=0, discard=500, flat=True)
    assert np.all(np.abs(chain.mean(0)) < 0.1)
    assert np.all(np.abs(chain.std(0) - 1) < 0.08)


def test_move_mixture():
    T, nw, nd = 4, 16, 2
    pt = PTSampler(
        T,
        nw,
        nd,
        log_like_bimodal,
        log_prior_box,
        moves=[(moves.StretchMove(), 0.7), (moves.DEMove(), 0.3)],
        seed=0,
    )
    coords = jax.random.normal(jax.random.key(0), (T, nw, nd))
    pt.run_mcmc(coords, 30)
    assert pt.get_chain().shape == (30, T, nw, nd)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
def test_sharded_tempering():
    T, nw, nd = 4, 64, 2
    mesh = walker_mesh()
    pt = PTSampler(
        T, nw, nd, log_like_bimodal, log_prior_box, seed=0, mesh=mesh
    )
    coords = jax.random.normal(jax.random.key(0), (T, nw, nd))
    pt.run_mcmc(coords, 50)
    assert pt.get_chain().shape == (50, T, nw, nd)
    assert np.all(np.isfinite(pt.get_chain()))


def test_log_evidence_gaussian():
    """lnZ of a unit normal with uniform prior on [-10,10]^1."""
    nw, nd, T = 32, 1, 12

    def ll(x):
        return -0.5 * jnp.sum(x**2)

    def lp(x):
        return jnp.where(jnp.all(jnp.abs(x) < 10.0), -jnp.log(20.0), -jnp.inf)

    pt = PTSampler(T, nw, nd, ll, lp, seed=0)
    coords = jax.random.uniform(
        jax.random.key(1), (T, nw, nd), minval=-9, maxval=9
    )
    pt.run_mcmc(coords, 3000)
    lnz = pt.log_evidence_estimate(discard=1000)
    true = np.log(np.sqrt(2 * np.pi) / 20.0)
    assert abs(lnz - true) < 0.25
    # Stepping-stone (Xie et al. 2011) on the same stored chains: lower
    # discretization bias than TI, so at least as close here.
    lnz_ss = pt.log_evidence_estimate(discard=1000, method="stepping-stone")
    assert abs(lnz_ss - true) < 0.25
    # Error estimate: half-ladder discrepancy — conservative (the
    # 6-rung half of this ratio-2.4 ladder is very coarse), but finite
    # and of the right order.
    lnz2, dlnz = pt.log_evidence_estimate(discard=1000, return_error=True)
    assert lnz2 == lnz
    assert 0.0 <= dlnz < 1.0
    with pytest.raises(ValueError):
        pt.log_evidence_estimate(method="harmonic")


def test_pt_sample_generator():
    T, nw, nd = 4, 16, 2
    pt = PTSampler(T, nw, nd, log_like_bimodal, log_prior_box, seed=0)
    coords = jax.random.normal(jax.random.key(0), (T, nw, nd))
    n = 0
    for state in pt.sample(coords, iterations=5):
        n += 1
        assert state.coords.shape == (T, nw, nd)
    assert n == 5
    assert pt.iteration == 5


def test_pt_tune_hook_adapts():
    """GaussianMove(tune_target=...) must adapt inside a PT run (the tune
    hook threads through _move_step per temperature)."""
    T, nw, nd = 4, 16, 2
    mv = moves.GaussianMove(4.0, tune_target=0.45)
    pt = PTSampler(T, nw, nd, log_like_bimodal, log_prior_box,
                   moves=mv, seed=0)
    coords = jax.random.normal(jax.random.key(1), (T, nw, nd))
    pt.run_mcmc(coords, 150, tune=True)
    carry = jax.device_get(pt._move_carries[0])
    # Every rung holds its own adaptation state, and it moved.
    assert carry["t"].shape == (T,)
    assert np.all(carry["t"] == 150)
    assert np.any(np.abs(carry["log_adj"]) > 1e-3)
    # Without tune=True the carry must not move.
    pt2 = PTSampler(T, nw, nd, log_like_bimodal, log_prior_box,
                    moves=moves.GaussianMove(4.0, tune_target=0.45), seed=0)
    pt2.run_mcmc(coords, 20)
    carry2 = jax.device_get(pt2._move_carries[0])
    assert np.all(carry2["t"] == 0)


def test_adaptive_ladder_equalizes_swap_rates():
    """A deliberately bad geometric ladder (huge top temperature) must move
    toward equalized adjacent swap acceptance under adaptive=True."""
    T, nw, nd = 6, 64, 1
    bad = default_beta_ladder(T, nd, max_temp=1e6)

    def run(adaptive):
        pt = PTSampler(
            T, nw, nd, log_like_bimodal, log_prior_box,
            betas=bad.copy(), adaptive=adaptive,
            adaptation_lag=1000, adaptation_time=20, seed=3,
        )
        coords = jax.random.uniform(
            jax.random.key(5), (T, nw, nd), minval=-8, maxval=8
        )
        # Many short chunks so the ladder gets adapted repeatedly.
        pt.run_mcmc(coords, 100, store=False)
        for _ in range(12):
            pt.run_mcmc(None, 100, store=False)
        pt.run_mcmc(None, 300)
        rates = pt.tswap_acceptance_fraction
        return pt, np.asarray(rates, dtype=float)

    pt_a, rates_a = run(True)
    pt_f, rates_f = run(False)
    assert not np.allclose(pt_a.betas, bad), "ladder never adapted"
    # Adaptation must shrink the spread of adjacent swap rates vs the
    # frozen bad ladder.
    assert rates_a.std() < rates_f.std(), (rates_a, rates_f)
    # beta_0 stays pinned at 1.
    assert pt_a.betas[0] == 1.0


def test_adapted_ladder_restored_on_resume():
    """Re-opening a backend must resume the adapted ladder, not the
    constructor default (betas are persisted per chunk)."""
    from emcee_tpu.backends.pt import PTBackend

    T, nw, nd = 5, 32, 1
    be = PTBackend()
    pt = PTSampler(
        T, nw, nd, log_like_bimodal, log_prior_box,
        adaptive=True, adaptation_lag=500, adaptation_time=10,
        backend=be, seed=0,
    )
    coords = jax.random.uniform(
        jax.random.key(2), (T, nw, nd), minval=-8, maxval=8
    )
    for i in range(5):
        pt.run_mcmc(coords if i == 0 else None, 80)
    adapted = pt.betas.copy()
    assert not np.allclose(adapted, default_beta_ladder(T, nd))

    resumed = PTSampler(
        T, nw, nd, log_like_bimodal, log_prior_box,
        adaptive=True, backend=be, seed=0,
    )
    np.testing.assert_allclose(resumed.betas, adapted)
    # And it keeps running from there.
    resumed.run_mcmc(None, 10)
    assert resumed.iteration == 5 * 80 + 10


def test_pt_tune_hook_adapts_red_blue():
    """StretchMove(tune_target=...) adapts per rung inside a PT run (the
    red-blue family's acceptance-targeted tuning, not just GaussianMove)."""
    T, nw, nd = 4, 16, 2
    mv = moves.StretchMove(a=40.0, tune_target=0.35)
    pt = PTSampler(T, nw, nd, log_like_bimodal, log_prior_box,
                   moves=mv, seed=0)
    coords = jax.random.normal(jax.random.key(2), (T, nw, nd))
    pt.run_mcmc(coords, 150, tune=True)
    carry = jax.device_get(pt._move_carries[0])
    assert carry["t"].shape == (T,)
    assert np.all(carry["t"] == 150)
    # The oversized stretch must have been pulled in on every rung.
    assert np.all(carry["log_adj"] < -1e-2)


def test_pt_with_gradient_move():
    """Tempered Langevin: gradient moves run per rung through the same
    Move protocol (the tempered model exposes compute_log_prob, so
    jax.grad flows through beta*logL + logP); the bimodal mode-occupation
    oracle confirms swaps still carry states down the ladder."""
    from emcee_tpu import moves as _m

    def log_like(x):
        a = -0.5 * jnp.sum((x - 3.0) ** 2)
        b = -0.5 * jnp.sum((x + 3.0) ** 2)
        return jnp.logaddexp(a, b)

    def log_prior(x):
        return -0.5 * jnp.sum(x**2) / 100.0  # smooth: grads everywhere

    c0 = np.random.default_rng(0).normal(size=(8, 32, 1))
    for mv in (_m.MALAMove(0.8), _m.EnsembleMALAMove(0.8)):
        pt = PTSampler(
            8, 32, 1, log_like, log_prior, seed=0, moves=mv
        )
        pt.run_mcmc(c0, 1500)
        cold = np.asarray(pt.get_chain(temp=0, flat=True, discard=300))
        frac_pos = float(np.mean(cold > 0))
        assert 0.25 < frac_pos < 0.75, (type(mv).__name__, frac_pos)


def test_pt_dime_adapts_per_rung():
    """DIMEMove inside a PT run: the adaptive proposal moments are carried
    per rung (hot rungs see a wider tempered target than the cold one) and
    the chain stays finite and well-behaved."""
    T, nw, nd = 4, 32, 2
    pt = PTSampler(T, nw, nd, log_like_bimodal, log_prior_box,
                   moves=moves.DIMEMove(aimh_prob=0.15), seed=5)
    coords = jax.random.normal(jax.random.key(2), (T, nw, nd))
    pt.run_mcmc(coords, 300)
    assert np.all(np.isfinite(np.asarray(pt.get_chain())))
    carry = jax.device_get(pt._move_carries[0])
    assert carry["mean"].shape == (T, nd)
    assert carry["cov"].shape == (T, nd, nd)
    assert np.all(carry["w"] > 0)  # every rung accumulated history
    # Hot-rung proposal variance exceeds the cold rung's (the tempered
    # bimodal target widens as beta drops).
    var0 = np.trace(carry["cov"][0])
    varT = np.trace(carry["cov"][-1])
    assert varT > var0


def test_pt_io_dtype():
    """PTSampler(io_dtype=...) compresses only the stored chain: same
    trajectory as the full-precision run up to the storage cast."""
    from emcee_tpu.backends.pt import PTBackend

    T, nw, nd = 4, 16, 2
    coords = np.asarray(
        jax.random.normal(jax.random.key(4), (T, nw, nd))
    )

    def run(io_dtype):
        pt = PTSampler(
            T, nw, nd, log_like_bimodal, log_prior_box, seed=9,
            backend=PTBackend(
                dtype=np.float16 if io_dtype else None
            ),
            io_dtype=io_dtype,
        )
        pt.run_mcmc(coords, 30)
        return pt

    p16 = run(np.float16)
    p32 = run(None)
    assert p16.backend.chain.dtype == np.float16
    np.testing.assert_allclose(
        np.asarray(p16.get_chain(), dtype=np.float64),
        np.asarray(p32.get_chain(), dtype=np.float64),
        rtol=0,
        atol=0.05,
    )
    # log_like stays full precision on the wire (cast only by the
    # backend's own dtype, never in-jit).
    assert np.all(np.isfinite(p16.get_log_like()))


def test_pt_interrupt_keeps_chain_consistent():
    """Regression: PT resume anchors must advance with the saved chunks —
    an interrupt mid-run previously left the backend ahead of the
    anchors, so resuming duplicated early steps after the saved rows."""
    from emcee_tpu.backends.pt import PTBackend

    T, nw, nd, nsteps = 4, 16, 2, 20
    coords = np.asarray(
        jax.random.normal(jax.random.key(6), (T, nw, nd))
    )

    def make():
        return PTSampler(
            T, nw, nd, log_like_bimodal, log_prior_box, seed=8,
            backend=PTBackend(),
            io_chunk_bytes=T * nw * (nd + 3) * 4 * 5,  # ~5 kept/chunk
        )

    ref = make()
    ref.run_mcmc(coords, nsteps)
    ref_chain = np.asarray(ref.get_chain())

    s = make()
    orig = s.backend.save_chunk
    calls = {"n": 0}

    def boom(*a, **k):
        calls["n"] += 1
        if calls["n"] == 2:
            raise KeyboardInterrupt
        return orig(*a, **k)

    s.backend.save_chunk = boom
    with pytest.raises(KeyboardInterrupt):
        s.run_mcmc(coords, nsteps)
    s.backend.save_chunk = orig

    saved = s.backend.iteration
    assert 0 < saved < nsteps
    s.run_mcmc(None, nsteps - saved)
    assert s.backend.iteration == nsteps
    np.testing.assert_allclose(
        np.asarray(s.get_chain()), ref_chain, rtol=1e-6, atol=1e-6
    )
    # Swap bookkeeping stayed monotone and consistent too.
    assert np.all(np.asarray(s.swaps_proposed) >= np.asarray(s.swaps_accepted))


def test_pt_adaptive_interrupt_ladder_consistent():
    """Regression: with adaptive=True, the in-memory ladder must commit
    together with the saved chunk — an interrupt (even one landing in
    the save itself) may not leave self.betas ahead of the stored
    ladder, and resume must continue cleanly."""
    from emcee_tpu.backends.pt import PTBackend

    T, nw = 6, 32
    bad = default_beta_ladder(T, 1, max_temp=1e5)
    pt = PTSampler(
        T, nw, 1, log_like_bimodal, log_prior_box,
        betas=bad.copy(), adaptive=True,
        adaptation_lag=500, adaptation_time=10, seed=0,
        backend=PTBackend(),
        io_chunk_bytes=T * nw * 4 * 4 * 10,  # ~10 kept per chunk
    )
    coords = np.asarray(jax.random.uniform(
        jax.random.key(1), (T, nw, 1), minval=-8, maxval=8
    ))
    orig = pt.backend.save_chunk
    calls = {"n": 0}

    def boom(*a, **k):
        calls["n"] += 1
        if calls["n"] == 3:
            raise KeyboardInterrupt
        return orig(*a, **k)

    pt.backend.save_chunk = boom
    with pytest.raises(KeyboardInterrupt):
        pt.run_mcmc(coords, 60)
    pt.backend.save_chunk = orig

    np.testing.assert_allclose(pt.betas, np.asarray(pt.backend.betas))
    assert not np.allclose(pt.betas, bad)  # adaptation actually ran
    saved = pt.backend.iteration
    assert 0 < saved < 60
    pt.run_mcmc(None, 60 - saved)
    assert pt.backend.iteration == 60
    assert np.all(np.isfinite(pt.get_chain()))


def test_pt_deprecated_thin_argument():
    """v1.2 PTSampler back-compat: ``thin=`` counts proposals, warns,
    equals ``thin_by=thin`` with ``n // thin`` kept steps."""
    import warnings as _w

    import emcee_tpu

    def ll(x):
        return -0.5 * jnp.sum(x**2)

    def lp(x):
        return 0.0

    c0 = np.asarray(jax.random.normal(jax.random.key(2), (3, 8, 2)))
    a = emcee_tpu.PTSampler(3, 8, 2, ll, lp, seed=4)
    with _w.catch_warnings():
        _w.simplefilter("always")
        with pytest.warns(DeprecationWarning, match="'thin'"):
            a.run_mcmc(c0, 12, thin=3)
    b = emcee_tpu.PTSampler(3, 8, 2, ll, lp, seed=4)
    b.run_mcmc(c0, 4, thin_by=3)
    np.testing.assert_array_equal(
        np.asarray(a.get_chain()), np.asarray(b.get_chain())
    )
    assert a.get_chain().shape[0] == 4


def test_pt_blobless_resume_of_blobful_chain_rejected():
    """PT equivalent of the stale-blob resume guard."""
    import emcee_tpu
    from emcee_tpu.backends.pt import PTBackend

    def ll_b(x):
        return -0.5 * jnp.sum(x**2), jnp.sum(x)

    def ll_nb(x):
        return -0.5 * jnp.sum(x**2)

    def lp(x):
        return 0.0

    be = PTBackend()
    c0 = np.asarray(jax.random.normal(jax.random.key(1), (2, 8, 2)))
    pt1 = emcee_tpu.PTSampler(2, 8, 2, ll_b, lp, seed=0, backend=be)
    pt1.run_mcmc(c0, 4)
    pt2 = emcee_tpu.PTSampler(2, 8, 2, ll_nb, lp, seed=0, backend=be)
    with pytest.raises(ValueError, match="inconsistent use of blobs"):
        pt2.run_mcmc(None, 3)


def test_pt_run_stats():
    """PTSampler.run_mcmc fills the same RunStats surface as the flat
    sampler (throughput counters over all rungs)."""
    import emcee_tpu

    def ll(x):
        return -0.5 * jnp.sum(x**2)

    def lp(x):
        return 0.0

    pt = emcee_tpu.PTSampler(2, 8, 2, ll, lp, seed=0)
    c0 = np.asarray(jax.random.normal(jax.random.key(1), (2, 8, 2)))
    pt.run_mcmc(c0, 6, thin_by=2)
    st = pt.last_run_stats
    assert st.nsteps == 6 and st.nproposals == 12
    assert st.nwalkers == 16 and st.chunks >= 1
    assert len(st.chunk_times) == st.chunks
    assert st.walltime_s > 0 and st.walker_steps_per_sec > 0
    assert "kept steps" in st.summary()
    # store=False runs fetch nothing through the backend; the forced
    # value fetch keeps the recorded walltime honest anyway.
    pt.run_mcmc(None, 4, store=False)
    assert pt.last_run_stats.nsteps == 4
    assert pt.last_run_stats.walltime_s > 0
