"""Posterior summary / arviz-export tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import emcee_tpu
from emcee_tpu.stats import hdi, summary, _posterior_dict


def test_hdi_normal():
    rng = np.random.default_rng(0)
    x = rng.normal(size=200_000)
    lo, hi = hdi(x, prob=0.94)
    # Narrowest 94% interval of a standard normal is symmetric ±1.881.
    assert abs(lo + 1.881) < 0.05
    assert abs(hi - 1.881) < 0.05


def test_hdi_skewed_narrower_than_quantiles():
    rng = np.random.default_rng(1)
    x = rng.exponential(size=100_000)
    lo, hi = hdi(x, prob=0.9)
    qlo, qhi = np.quantile(x, [0.05, 0.95])
    assert lo < qlo  # HDI of an exponential hugs zero
    assert hi - lo < qhi - qlo + 1e-9


def test_hdi_batched_shape():
    rng = np.random.default_rng(2)
    out = hdi(rng.normal(size=(1000, 3)))
    assert out.shape == (2, 3)
    assert np.all(out[0] < out[1])


def test_summary_raw_chain_stats():
    rng = np.random.default_rng(3)
    # Independent draws: tau ~ 1, rhat ~ 1, moments exact.
    chain = rng.normal(size=(2000, 16, 2)) * np.array([1.0, 3.0]) + np.array(
        [0.0, 5.0]
    )
    s = summary(chain)
    assert s.names == ["x0", "x1"]
    assert np.allclose(s["mean"], [0.0, 5.0], atol=0.05)
    assert np.allclose(s["sd"], [1.0, 3.0], rtol=0.03)
    assert np.all(s["rhat"] < 1.01)
    assert np.all(s["ess"] > 5000)
    assert np.all(s["mcse_mean"] < 0.1)
    # HDI brackets the mean.
    assert np.all(s["hdi_lo"] < s["mean"])
    assert np.all(s["hdi_hi"] > s["mean"])
    d = s.to_dict()
    assert set(d) == {"x0", "x1"}
    assert abs(d["x1"]["mean"] - 5.0) < 0.1
    table = repr(s)
    assert "mean" in table and "rhat" in table and "x1" in table


def test_summary_from_sampler_with_names():
    def lp(p):
        return -0.5 * (p["a"] ** 2 + jnp.sum(p["b"] ** 2))

    s = emcee_tpu.EnsembleSampler(
        32, 3, lp, parameter_names={"a": 0, "b": [1, 2]}, seed=0
    )
    p0 = np.random.default_rng(0).normal(size=(32, 3))
    s.run_mcmc(p0, 600)
    rep = summary(s, discard=100)
    assert rep.names == ["a", "b[0]", "b[1]"]
    assert np.all(np.abs(rep["mean"]) < 0.25)
    assert np.all(np.isfinite(rep["tau"]))


def test_summary_thin_scales_tau():
    def lp(x):
        return -0.5 * jnp.sum(x**2)

    s = emcee_tpu.EnsembleSampler(16, 2, lp, seed=1)
    p0 = np.random.default_rng(1).normal(size=(16, 2))
    s.run_mcmc(p0, 800)
    full = summary(s, discard=100)
    thinned = summary(s, discard=100, thin=4)
    # tau is reported in proposal units: thinning must not shrink it.
    assert np.all(thinned["tau"] > 0.5 * full["tau"])


def test_summary_var_names_mismatch():
    with pytest.raises(ValueError):
        summary(np.zeros((10, 4, 2)), var_names=["only_one"])


def test_posterior_dict_arviz_layout():
    def lp(p):
        return -0.5 * (p["m"] ** 2 + p["b"] ** 2)

    s = emcee_tpu.EnsembleSampler(
        8, 2, lp, parameter_names=["m", "b"], seed=2
    )
    p0 = np.random.default_rng(2).normal(size=(8, 2))
    s.run_mcmc(p0, 50)
    posterior, stats = _posterior_dict(s, discard=10)
    assert set(posterior) == {"m", "b"}
    assert posterior["m"].shape == (8, 40)  # (chain, draw)
    assert stats["lp"].shape == (8, 40)
    # Values line up with get_chain.
    chain = np.asarray(s.get_chain(discard=10))
    assert np.array_equal(posterior["b"], chain[:, :, 1].T)


def test_posterior_dict_unnamed_single_var():
    def lp(x):
        return -0.5 * jnp.sum(x**2)

    s = emcee_tpu.EnsembleSampler(8, 3, lp, seed=3)
    s.run_mcmc(np.random.default_rng(3).normal(size=(8, 3)), 20)
    posterior, _ = _posterior_dict(s)
    assert set(posterior) == {"x"}
    assert posterior["x"].shape == (8, 20, 3)


def test_summary_pt_cold_chain():
    """summary() over the PT cold rung (raw-chain input path)."""

    def ll(x):
        return -0.5 * jnp.sum(x**2)

    def lpr(x):
        return 0.0

    pt = emcee_tpu.PTSampler(4, 16, 2, ll, lpr, seed=0)
    p0 = np.random.default_rng(0).normal(size=(4, 16, 2))
    pt.run_mcmc(p0, 500)
    rep = summary(pt.get_chain(temp=0, discard=100))
    assert np.all(np.abs(rep["mean"]) < 0.3)
    assert np.all(rep["sd"] > 0.7)


def test_stats_module_not_shadowed_by_function():
    """The implementation module is emcee_tpu.stats so the summary()
    re-export cannot shadow it (module/function name collision)."""
    import importlib

    mod = importlib.import_module("emcee_tpu.stats")
    assert callable(mod.hdi) and callable(mod.summary)
    assert emcee_tpu.stats is mod
    assert callable(emcee_tpu.summary)  # top-level name is the function


def test_to_inference_data_requires_arviz():
    pytest.importorskip("arviz", reason="covered when arviz present")


def test_summary_tau_method_and_sampler_geyer():
    """tau_method plumbs through summary, and the sampler's
    get_autocorr_time forwards method= to the estimator."""
    import jax
    import jax.numpy as jnp

    from emcee_tpu import EnsembleSampler, stats

    s = EnsembleSampler(32, 2, lambda x: -0.5 * jnp.sum(x**2), seed=4)
    coords = np.asarray(
        jax.random.normal(jax.random.key(4), (32, 2))
    )
    s.run_mcmc(coords, 1500)

    tau_g = s.get_autocorr_time(discard=200, quiet=True, method="geyer")
    tau_s = s.get_autocorr_time(discard=200, quiet=True)
    assert np.all(tau_g > 0) and np.all(tau_s > 0)
    assert np.all(np.abs(tau_g - tau_s) / tau_s < 0.5)

    rep_g = stats.summary(s, discard=200, tau_method="geyer")
    rep_s = stats.summary(s, discard=200)
    tg = np.array([rep_g.to_dict()[k]["tau"] for k in rep_g.names])
    ts = np.array([rep_s.to_dict()[k]["tau"] for k in rep_s.names])
    assert np.all(tg > 0)
    assert np.all(np.abs(tg - ts) / ts < 0.5)
