"""EnsembleSliceMove integration tests (zeus-style differential slice
sampling, Karamanis & Beutler 2021; no reference counterpart — validated
against the same statistical oracle as every other move)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import emcee_tpu
from emcee_tpu import moves

from .test_proposal import _test_normal


def test_normal_slice():
    # check_acceptance off: slice sampling moves on ~every proposal, so
    # the reference's 0.1-0.9 Metropolis window does not apply.
    _test_normal(
        moves.EnsembleSliceMove(), nsteps=2000, check_acceptance=False
    )


def test_normal_slice_3d_blocked():
    _test_normal(
        moves.EnsembleSliceMove(randomize_split=False),
        ndim=3,
        nsteps=2000,
        check_acceptance=False,
    )


def test_normal_slice_blobs():
    _test_normal(
        moves.EnsembleSliceMove(),
        nsteps=1500,
        check_acceptance=False,
        blobs=True,
    )


def test_uniform_slice():
    """Inverse sanity check (the harness's _test_uniform asserts the
    Metropolis acceptance window, which rejection-free slice sampling
    correctly violates — so run the K-S leg directly): a chain sampled
    from a normal must fail a uniform K-S test."""
    stats = pytest.importorskip("scipy.stats")
    from .test_proposal import normal_log_prob

    key = jax.random.key(1234)
    coords = jax.random.uniform(key, (32, 1))
    s = emcee_tpu.EnsembleSampler(
        32, 1, normal_log_prob, moves=moves.EnsembleSliceMove(), seed=1234
    )
    s.run_mcmc(coords, 2000)
    samps = np.asarray(s.get_chain(flat=True))
    np.random.default_rng(1234).shuffle(samps)
    ks, _ = stats.kstest(samps[::100, 0], "uniform")
    assert ks > 0.1, "The K-S test failed"


def test_slice_acceptance_near_one():
    """Every slice update lands (the move is rejection-free up to the
    shrinkage-cap fallback, which should never fire on a Gaussian)."""

    def lp(x):
        return -0.5 * jnp.sum(x**2)

    s = emcee_tpu.EnsembleSampler(
        32, 2, lp, moves=moves.EnsembleSliceMove(), seed=3
    )
    coords = np.random.default_rng(3).normal(size=(32, 2))
    s.run_mcmc(coords, 200)
    assert s.acceptance_fraction.min() > 0.99


def test_slice_tune_mu_recovers_bad_scale():
    """mu grossly too small: tune_mu expands it toward balance and the
    chain still mixes."""

    def lp(x):
        return -0.5 * jnp.sum(x**2)

    move = moves.EnsembleSliceMove(mu=0.01, tune_mu=True, tune_rate=1.0)
    s = emcee_tpu.EnsembleSampler(32, 2, lp, moves=move, seed=7)
    coords = 0.01 * np.random.default_rng(7).normal(size=(32, 2))
    s.run_mcmc(coords, 800, tune=True)
    chain = np.asarray(s.get_chain(discard=400, flat=True))
    assert abs(chain.mean()) < 0.15
    assert abs(chain.std() - 1.0) < 0.15


def test_slice_rejects_tune_target():
    with pytest.raises(ValueError):
        moves.EnsembleSliceMove(tune_target=0.5)
    with pytest.raises(ValueError):
        moves.EnsembleSliceMove(mu=-1.0)


def test_slice_rejects_blending():
    """Slice has no (q, factors) proposal, so BlendedMove must refuse it
    at construction rather than crash at trace time."""
    with pytest.raises(ValueError, match="cannot be blended"):
        moves.BlendedMove(
            [moves.EnsembleSliceMove(), moves.StretchMove()]
        )


def test_slice_blob_values_track_chain():
    """Blobs ride the shrink-loop carry: stored blob == f(stored coords)
    at every step (regression for the landed-point blob recovery)."""

    def lpb(x):
        return -0.5 * jnp.sum(x**2), jnp.sum(x)

    s = emcee_tpu.EnsembleSampler(
        16, 2, lpb, moves=moves.EnsembleSliceMove(), seed=0
    )
    p0 = np.random.default_rng(1).normal(size=(16, 2))
    s.run_mcmc(p0, 30)
    ch = np.asarray(s.get_chain())
    bl = np.asarray(s.get_blobs())
    assert np.allclose(bl, ch.sum(axis=-1), atol=1e-5)


def test_slice_tight_budget_heavy_tail_exact():
    """Apportioned stepping-out (Neal's J/K split) keeps the update
    exact when the expansion budget binds: a Cauchy target sampled with
    max_steps=4 still gets its tail mass right."""

    def lp_cauchy(x):
        return -jnp.sum(jnp.log1p(x**2))

    s = emcee_tpu.EnsembleSampler(
        64, 1, lp_cauchy,
        moves=moves.EnsembleSliceMove(max_steps=4), seed=2,
    )
    p0 = np.random.default_rng(2).standard_cauchy(size=(64, 1))
    p0 = p0.clip(-50, 50)
    s.run_mcmc(p0, 3000)
    samps = np.asarray(s.get_chain(discard=500, flat=True)).ravel()
    assert abs(np.median(samps)) < 0.1
    assert abs((np.abs(samps) > 1.0).mean() - 0.5) < 0.05


def test_slice_in_mixture():
    """Weighted mixture with a Metropolis move through lax.switch."""

    def lp(x):
        return -0.5 * jnp.sum(x**2)

    s = emcee_tpu.EnsembleSampler(
        32,
        2,
        lp,
        moves=[(moves.EnsembleSliceMove(), 0.5), (moves.StretchMove(), 0.5)],
        seed=11,
    )
    coords = np.random.default_rng(11).normal(size=(32, 2))
    s.run_mcmc(coords, 500)
    chain = np.asarray(s.get_chain(discard=200, flat=True))
    assert abs(chain.mean()) < 0.15
    assert abs(chain.std() - 1.0) < 0.15


def test_slice_in_tempered_ladder():
    """Slice per rung inside PTSampler: the masked while_loops compose
    with the vmapped temperature axis and swaps still mix modes."""

    def ll(x):
        return jnp.logaddexp(
            -0.5 * jnp.sum((x - 2.0) ** 2), -0.5 * jnp.sum((x + 2.0) ** 2)
        )

    def lpr(x):
        return jnp.where(jnp.all(jnp.abs(x) < 8.0), 0.0, -jnp.inf)

    pt = emcee_tpu.PTSampler(
        4, 16, 1, ll, lpr, moves=moves.EnsembleSliceMove(), seed=2
    )
    coords = np.random.default_rng(2).normal(size=(4, 16, 1))
    pt.run_mcmc(coords, 400)
    cold = np.asarray(pt.get_chain(discard=100, temp=0)).reshape(-1)
    # Both modes occupied on the cold rung.
    assert (cold > 0).mean() > 0.15 and (cold < 0).mean() > 0.15


def test_slice_sharded_matches_dense_statistically():
    """Walker-sharded slice runs mix to the same posterior."""
    from emcee_tpu.parallel import walker_mesh

    ndev = len(jax.devices())
    if ndev < 2:
        pytest.skip("needs multiple devices")
    mesh = walker_mesh()

    def lp(x):
        return -0.5 * jnp.sum(x**2)

    s = emcee_tpu.EnsembleSampler(
        64, 2, lp, moves=moves.EnsembleSliceMove(), seed=5, mesh=mesh
    )
    coords = np.random.default_rng(5).normal(size=(64, 2))
    s.run_mcmc(coords, 1000)
    chain = np.asarray(s.get_chain(discard=400, flat=True))
    assert abs(chain.mean()) < 0.1
    assert abs(chain.std() - 1.0) < 0.1
