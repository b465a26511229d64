"""Autocorrelation estimator tests (reference ``tests/unit/test_autocorr.py``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emcee_tpu.autocorr import AutocorrError, function_1d, integrated_time
from emcee_tpu.ops import autocorr


def get_chain(seed=1234, ndim=3, N=100000):
    rng = np.random.default_rng(seed)
    a = 0.9
    x = np.empty((N, ndim))
    x[0] = np.zeros(ndim)
    for i in range(1, N):
        x[i] = x[i - 1] * a + rng.normal(size=ndim)
    return x


def test_1d():
    # AR(1) with a=0.9 has tau = (1+a)/(1-a) = 19.
    x = get_chain(ndim=1, N=250000)[:, 0]
    tau = integrated_time(x)
    assert np.all(np.abs(tau - 19.0) / 19.0 < 0.2)


def test_nd():
    x = get_chain(N=150000)
    tau = integrated_time(x[:, None, :])
    assert tau.shape == (3,)
    assert np.all(np.abs(tau - 19.0) / 19.0 < 0.2)


def test_has_walkers_axis():
    x = get_chain(ndim=2, N=100000)
    # (n, 2) interpreted as 2 walkers of the same series
    tau_w = integrated_time(x, has_walkers=True)
    assert tau_w.shape == (1,)
    # (n, 2) interpreted as 2 params
    tau_p = integrated_time(x, has_walkers=False)
    assert tau_p.shape == (2,)


def test_too_short():
    x = get_chain(N=100)
    with pytest.raises(AutocorrError):
        integrated_time(x[:, None, :])
    # quiet=True returns the estimate anyway
    tau = integrated_time(x[:, None, :], quiet=True)
    assert tau.shape == (3,)


def test_function_1d():
    x = get_chain(ndim=1, N=10000)[:, 0]
    acf = function_1d(x)
    assert acf.shape == (10000,)
    assert np.isclose(acf[0], 1.0)
    # AR(1): acf[k] ~ a^k for small k
    assert np.all(np.abs(acf[1:4] - 0.9 ** np.arange(1, 4)) < 0.05)


def test_function_1d_invalid():
    with pytest.raises(ValueError):
        function_1d(np.zeros((10, 2)))


def test_rhat_stationary_near_one():
    """IID chains from one distribution: split R-hat ~ 1."""
    from emcee_tpu.autocorr import rhat

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2000, 16, 3))
    r = rhat(x)
    assert r.shape == (3,)
    assert np.all(r < 1.02), r
    # 2-D input (single parameter) works too.
    assert rhat(x[:, :, 0]).shape == (1,)


def test_rhat_flags_stuck_chain():
    """One chain stuck in a shifted mode: R-hat far above 1."""
    from emcee_tpu.autocorr import rhat

    rng = np.random.default_rng(1)
    x = rng.normal(size=(1000, 8, 2))
    x[:, 0, 0] += 6.0
    # Rank normalization bounds the statistic (a huge shift saturates the
    # normal scores), so the flag threshold is lower than the classic
    # variance-ratio value — but still far above the 1.01 alarm level.
    r = rhat(x)
    assert r[0] > 1.2, r
    assert r[1] < 1.02, r
    assert rhat(x, rank_normalized=False)[0] > 1.5


def test_rhat_collapsed_ensemble_is_nan_not_one():
    """A fully collapsed ensemble (all draws exactly tied) must surface
    the degeneracy as NaN, not report a healthy R-hat — requires
    average (not ordinal) tie ranks in the rank-normalization."""
    from emcee_tpu.autocorr import rhat

    x = np.full((200, 8, 2), 3.14)
    r = rhat(x)
    assert np.all(np.isnan(r)), r


def test_rhat_heavy_ties_consistent_with_scipy_ranks():
    """Chains with many exact ties (rejection runs) use average-rank
    semantics, matching scipy.stats.rankdata."""
    from emcee_tpu.autocorr import rhat

    rng = np.random.default_rng(7)
    # Discretized draws: lots of exact ties, identical distribution
    # across chains -> R-hat must still sit near 1.
    x = np.round(rng.normal(size=(1000, 8, 1)) * 2) / 2
    r = rhat(x)
    assert r[0] < 1.02, r


def test_rhat_split_catches_drift():
    """A mean drift inside every chain is invisible to unsplit R-hat but
    caught by the split variant."""
    from emcee_tpu.autocorr import rhat

    rng = np.random.default_rng(2)
    n = 1000
    drift = np.linspace(-3, 3, n)[:, None, None]
    x = rng.normal(size=(n, 8, 1)) + drift
    assert rhat(x, split=False)[0] < 1.05
    assert rhat(x, split=True)[0] > 1.3


def test_rhat_rank_normalized_catches_tail_disagreement():
    """A heavy-tailed chain with matched location/scale is invisible to
    the classic variance-ratio R-hat but flagged by the rank-normalized
    folded (tail) statistic (Vehtari et al. 2021)."""
    from emcee_tpu.autocorr import rhat

    rng = np.random.default_rng(4)
    x = rng.normal(size=(2000, 8, 2))
    x[:, 1, 0] = rng.standard_t(df=1.2, size=2000) * 0.3
    r_rank = rhat(x)
    r_classic = rhat(x, rank_normalized=False)
    assert r_rank[0] > 1.01, r_rank
    assert r_classic[0] < 1.01, r_classic
    # The untouched parameter stays clean in both.
    assert r_rank[1] < 1.01 and r_classic[1] < 1.01


def test_rhat_rank_normalized_agrees_when_gaussian():
    """On well-behaved Gaussian chains the two variants agree near 1."""
    from emcee_tpu.autocorr import rhat

    rng = np.random.default_rng(5)
    x = rng.normal(size=(4000, 16, 3))
    np.testing.assert_allclose(
        rhat(x), rhat(x, rank_normalized=False), atol=0.02
    )


def test_rhat_validation():
    from emcee_tpu.autocorr import rhat

    with pytest.raises(ValueError):
        rhat(np.zeros((10, 2, 2, 2)))
    with pytest.raises(ValueError):
        rhat(np.zeros((3, 4)))  # too short for split
    with pytest.raises(ValueError):
        rhat(np.zeros((100, 1)), split=False)  # one chain, unsplit
    # One chain WITH splitting is valid (the halves are the two chains).
    assert rhat(np.random.default_rng(0).normal(size=(100, 1))).shape == (1,)


def test_rhat_on_sampler_chain():
    """A converged ensemble run reads near 1."""
    import emcee_tpu
    import jax.numpy as jnp
    from emcee_tpu.autocorr import rhat

    def lp(x):
        return -0.5 * jnp.sum(x**2)

    s = emcee_tpu.EnsembleSampler(32, 2, lp, seed=0)
    p0 = np.random.default_rng(3).normal(size=(32, 2))
    s.run_mcmc(p0, 2000)
    r = rhat(np.asarray(s.get_chain(discard=200)))
    assert np.all(r < 1.05), r


def test_ess():
    from emcee_tpu.autocorr import ess

    # AR(1) with a=0.9: tau = 19, so ESS ~ N / 19 for one series.
    x = get_chain(ndim=1, N=250000)[:, 0]
    n_eff = ess(x)
    assert np.all(np.abs(n_eff - 250000 / 19.0) / (250000 / 19.0) < 0.25)
    # walker axis multiplies the sample count
    xw = get_chain(ndim=2, N=100000)  # 2 "walkers" of the same series
    n_eff_w = ess(xw, has_walkers=True)
    assert n_eff_w.shape == (1,)
    assert np.all(n_eff_w > 100000 / 19.0)  # more than one walker's worth
    with pytest.raises(AutocorrError):
        ess(get_chain(N=100)[:, None, :])


def test_geyer_matches_known_tau():
    # Same AR(1) oracle through the Geyer initial-monotone-sequence rule.
    x = get_chain(ndim=1, N=250000)[:, 0]
    tau = integrated_time(x, method="geyer")
    assert np.all(np.abs(tau - 19.0) / 19.0 < 0.2)
    # And the two truncation rules agree on a well-behaved chain.
    tau_sokal = integrated_time(x)
    assert np.all(np.abs(tau - tau_sokal) / tau_sokal < 0.15)


def test_geyer_white_noise():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(40000, 4, 2))
    tau = integrated_time(x, method="geyer", quiet=True)
    assert tau.shape == (2,)
    assert np.all(np.abs(tau - 1.0) < 0.2)


def test_unknown_method_raises():
    with pytest.raises(ValueError, match="unknown method"):
        integrated_time(np.zeros(100), method="wrong")


def test_geyer_antithetic_floor():
    # A strongly antithetic AR(1) (a=-0.9) drives the raw Geyer sum
    # toward tau <= 0; the estimate must stay positive so ESS is finite.
    rng = np.random.default_rng(3)
    n = 40000
    x = np.empty(n)
    x[0] = 0.0
    for i in range(1, n):
        x[i] = -0.9 * x[i - 1] + rng.normal()
    tau = integrated_time(x, method="geyer", quiet=True)
    assert np.all(tau > 0.0)
    assert np.all(tau < 1.0)  # antithetic: better than independent


def _ar1_chain(n=4000, m=8, d=3, seed=0, rho=0.8):
    rng = np.random.default_rng(seed)
    x = np.zeros((n, m, d))
    eps = rng.normal(size=(n, m, d))
    for i in range(1, n):
        x[i] = rho * x[i - 1] + eps[i]
    return x


def test_geyer_device_matches_host_semantics():
    """The jitted Geyer tau matches the float64 host formula on the
    same ACF within float32 tolerance."""
    x = _ar1_chain()
    tau_dev = np.asarray(
        autocorr.integrated_time(jnp.asarray(x), method="geyer", quiet=True)
    )
    # host reference computation of the same estimator
    f = np.asarray(autocorr._walker_mean_acf(jnp.asarray(x)), np.float64)
    npairs = f.shape[0] // 2
    g = f[0 : 2 * npairs : 2] + f[1 : 2 * npairs : 2]
    pos = g > 0.0
    k_stop = np.where(np.any(~pos, axis=0), np.argmin(pos, axis=0), npairs)
    g_mono = np.minimum.accumulate(g, axis=0)
    keep = np.arange(npairs)[:, None] < k_stop[None, :]
    tau_host = -1.0 + 2.0 * np.sum(np.where(keep, g_mono, 0.0), axis=0)
    tau_host = np.maximum(tau_host, 1.0 / np.log10(f.shape[0]))
    np.testing.assert_allclose(tau_dev, tau_host, rtol=5e-3)


def test_rhat_device_matches_host():
    x = _ar1_chain(n=2000, m=8, d=2, seed=3)
    r_host = autocorr.rhat(x)
    r_dev = autocorr.rhat(jnp.asarray(x))
    assert isinstance(r_dev, jax.Array)
    np.testing.assert_allclose(np.asarray(r_dev), r_host, rtol=2e-4)
    # plain (non-rank) path too
    np.testing.assert_allclose(
        np.asarray(autocorr.rhat(jnp.asarray(x), rank_normalized=False)),
        autocorr.rhat(x, rank_normalized=False),
        rtol=2e-4,
    )


def test_rhat_device_average_ties_degenerate():
    """A fully collapsed ensemble must surface as NaN on the device
    path too (average ties -> zero variance), not a fabricated healthy
    value."""
    x = np.ones((64, 8, 1))
    r = np.asarray(autocorr.rhat(jnp.asarray(x)))
    assert np.all(~np.isfinite(r))


def test_monitor_uses_device_paths_for_device_chain(monkeypatch):
    """Monitor + device-resident chain: the host-side rhat/rank
    implementations are never touched — with a DeviceBackend on TPU
    this is what 'no chain-sized transfer' means."""
    from emcee_tpu.monitor import ConvergenceMonitor
    from emcee_tpu.ops import autocorr as ac

    def boom(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("host-side diagnostic path used")

    monkeypatch.setattr(ac, "_rank_normalize", boom)
    monkeypatch.setattr(ac, "_psrf", boom)
    chain = jnp.asarray(_ar1_chain(n=400, m=8, d=2, seed=5))
    mon = ConvergenceMonitor(rhat_threshold=1.2)
    mon.update(chain)
    assert mon.rhat is not None and np.all(np.isfinite(mon.rhat))
