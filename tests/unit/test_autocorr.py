"""Autocorrelation estimator tests (reference ``tests/unit/test_autocorr.py``)."""

import numpy as np
import pytest

from emcee_tpu.autocorr import AutocorrError, function_1d, integrated_time


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
