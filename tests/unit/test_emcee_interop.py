"""Cross-validation against the reference emcee implementation.

Gated on the reference checkout being present (developer environments
only).  Uses reference emcee purely as a *test oracle*: run both samplers
on the same workload and require statistically indistinguishable
posteriors, and check HDF5 file interop in both directions.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF = "/root/reference/src"
emcee = None
if os.path.isdir(REF):
    sys.path.insert(0, REF)
    # The checkout lacks the setuptools_scm-generated version module the
    # package imports; stub it (read-only mount, cannot be generated).
    import types

    vmod = types.ModuleType("emcee.emcee_version")
    vmod.version = vmod.__version__ = "0.0.0-reference-checkout"
    sys.modules["emcee.emcee_version"] = vmod
    try:
        import emcee  # noqa: F401
    except Exception:
        emcee = None

import emcee_tpu

pytestmark = pytest.mark.skipif(
    emcee is None, reason="reference emcee not available"
)


def _correlated_target(ndim=3, seed=0):
    """Shared 3D correlated-Gaussian oracle target."""
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(ndim, ndim)) / np.sqrt(ndim)
    cov = A @ A.T + 0.5 * np.eye(ndim)
    icov = np.linalg.inv(cov)

    def np_log_prob(x):
        return -0.5 * x @ icov @ x

    icov_j = jnp.asarray(icov, dtype=jnp.float32)

    def jx_log_prob(x):
        return -0.5 * x @ icov_j @ x

    return cov, np_log_prob, jx_log_prob, rng


def test_posterior_matches_reference():
    """Both samplers on a 3D correlated Gaussian: same moments within MC error."""
    ndim, nwalkers, nsteps = 3, 32, 6000
    cov, np_log_prob, jx_log_prob, rng = _correlated_target(ndim)
    p0 = rng.normal(size=(nwalkers, ndim))

    ref = emcee.EnsembleSampler(nwalkers, ndim, np_log_prob)
    ref.run_mcmc(p0, nsteps, progress=False)
    ref_flat = ref.get_chain(flat=True, discard=1500)

    ours = emcee_tpu.EnsembleSampler(nwalkers, ndim, jx_log_prob, seed=3)
    ours.run_mcmc(p0, nsteps)
    our_flat = np.asarray(ours.get_chain(flat=True, discard=1500))

    # Means agree within combined MC error; covariances within 15%.
    se = np.sqrt(np.diag(cov)) * 0.08
    assert np.all(np.abs(ref_flat.mean(0) - our_flat.mean(0)) < 4 * se)
    ref_cov = np.cov(ref_flat, rowvar=False)
    our_cov = np.cov(our_flat, rowvar=False)
    err = np.linalg.norm(ref_cov - our_cov) / np.linalg.norm(ref_cov)
    assert err < 0.15, f"covariance mismatch {err:.3f}"

    # Integrated autocorrelation times must agree, not just correlate:
    # both samplers run the identical stretch-move algorithm, so with
    # 6000 steps x 32 walkers the two estimates sit well inside 30%.
    ref_tau = emcee.autocorr.integrated_time(
        ref.get_chain(), quiet=True
    )
    our_tau = ours.get_autocorr_time(quiet=True)
    assert np.all(np.abs(ref_tau - our_tau) / ref_tau < 0.3), (
        ref_tau, our_tau,
    )


@pytest.mark.parametrize(
    "make_move",
    [
        lambda: emcee_tpu.moves.DIMEMove(),
        lambda: emcee_tpu.moves.DEZMove(),
    ],
    ids=["dime", "dez"],
)
def test_adaptive_moves_match_reference_de(make_move):
    """DIME and DE-MC(Z) face the same oracle the ported moves do: the
    reference's DE+snooker mixture on the shared correlated Gaussian.
    Both are beyond-reference moves, so this is the strongest available
    external check of their stationary distribution."""
    ndim, nwalkers, nsteps = 3, 32, 4000
    cov, np_log_prob, jx_log_prob, rng = _correlated_target(ndim)
    p0 = rng.normal(size=(nwalkers, ndim))

    ref = emcee.EnsembleSampler(
        nwalkers,
        ndim,
        np_log_prob,
        moves=[
            (emcee.moves.DEMove(), 0.8),
            (emcee.moves.DESnookerMove(), 0.2),
        ],
    )
    ref.run_mcmc(p0, nsteps, progress=False)
    ref_flat = ref.get_chain(flat=True, discard=1000)

    ours = emcee_tpu.EnsembleSampler(
        nwalkers, ndim, jx_log_prob, moves=make_move(), seed=5
    )
    ours.run_mcmc(p0, nsteps)
    our_flat = np.asarray(ours.get_chain(flat=True, discard=1000))

    se = np.sqrt(np.diag(cov)) * 0.08
    assert np.all(np.abs(ref_flat.mean(0) - our_flat.mean(0)) < 4 * se)
    ref_cov = np.cov(ref_flat, rowvar=False)
    our_cov = np.cov(our_flat, rowvar=False)
    err = np.linalg.norm(ref_cov - our_cov) / np.linalg.norm(ref_cov)
    assert err < 0.15, f"covariance mismatch {err:.3f}"


def test_reference_reads_our_hdf(tmp_path):
    """A chain written by our HDFBackend must load through emcee's reader."""

    def jx_log_prob(x):
        return -0.5 * jnp.sum(x**2)

    fn = str(tmp_path / "ours.h5")
    be = emcee_tpu.backends.HDFBackend(fn)
    s = emcee_tpu.EnsembleSampler(16, 2, jx_log_prob, backend=be, seed=0)
    p0 = np.random.default_rng(1).normal(size=(16, 2))
    s.run_mcmc(p0, 50)

    ref_reader = emcee.backends.HDFBackend(fn, read_only=True)
    assert ref_reader.iteration == 50
    assert ref_reader.shape == (16, 2)
    np.testing.assert_allclose(
        np.asarray(ref_reader.get_chain()), np.asarray(s.get_chain())
    )
    np.testing.assert_allclose(
        np.asarray(ref_reader.get_log_prob()),
        np.asarray(s.get_log_prob()),
    )
    np.testing.assert_array_equal(
        ref_reader.accepted, s.backend.accepted
    )


def test_reference_reads_our_blobbed_hdf(tmp_path):
    """Blobs written by our HDFBackend — both the single-array layout and
    the multi-leaf structured layout — must load through emcee's reader."""

    def lp_single(x):
        return -0.5 * jnp.sum(x**2), x

    fn = str(tmp_path / "single.h5")
    s = emcee_tpu.EnsembleSampler(
        16, 2, lp_single, backend=emcee_tpu.backends.HDFBackend(fn), seed=0
    )
    p0 = np.random.default_rng(1).normal(size=(16, 2))
    s.run_mcmc(p0, 25)
    ref_blobs = emcee.backends.HDFBackend(fn, read_only=True).get_blobs()
    np.testing.assert_allclose(
        np.asarray(ref_blobs), np.asarray(s.get_blobs())
    )

    def lp_multi(x):
        return -0.5 * jnp.sum(x**2), jnp.sum(x), 2.0 * x

    fn2 = str(tmp_path / "multi.h5")
    s2 = emcee_tpu.EnsembleSampler(
        16,
        2,
        lp_multi,
        backend=emcee_tpu.backends.HDFBackend(fn2),
        blobs_dtype=[("total", float), ("doubled", float)],
        seed=0,
    )
    s2.run_mcmc(p0, 25)
    ref_reader = emcee.backends.HDFBackend(fn2, read_only=True)
    ref_blobs = ref_reader.get_blobs()
    assert ref_blobs.dtype.names == ("total", "doubled")
    ours = s2.get_blobs()
    np.testing.assert_allclose(
        np.asarray(ref_blobs["doubled"]), ours["doubled"]
    )
    np.testing.assert_allclose(
        np.asarray(ref_blobs["total"]), ours["total"]
    )


def test_we_read_reference_hdf(tmp_path):
    """A chain written by reference emcee must load through our backend."""

    def np_log_prob(x):
        return -0.5 * np.sum(x**2)

    fn = str(tmp_path / "ref.h5")
    be = emcee.backends.HDFBackend(fn)
    s = emcee.EnsembleSampler(16, 2, np_log_prob, backend=be)
    p0 = np.random.default_rng(1).normal(size=(16, 2))
    s.run_mcmc(p0, 50, progress=False)

    ours = emcee_tpu.backends.HDFBackend(fn)
    assert ours.initialized
    assert ours.iteration == 50
    np.testing.assert_allclose(
        np.asarray(ours.get_chain()), s.get_chain()
    )
    last = ours.get_last_sample()
    np.testing.assert_allclose(
        np.asarray(last.coords), s.get_last_sample().coords
    )


def test_line_fit_matches_reference():
    """The line-fit tutorial workload: same data, both samplers, same
    posterior (medians within combined MC error) and comparable tau."""
    rng = np.random.default_rng(123)
    N = 50
    m_true, b_true, f_true = -0.9594, 4.294, 0.534
    x = np.sort(10 * rng.uniform(size=N))
    yerr = 0.1 + 0.5 * rng.uniform(size=N)
    y = m_true * x + b_true
    y += np.abs(f_true * y) * rng.normal(size=N)
    y += yerr * rng.normal(size=N)

    def np_log_prob(theta):
        m, b, log_f = theta
        if not (-5 < m < 0.5 and 0 < b < 10 and -10 < log_f < 1):
            return -np.inf
        model = m * x + b
        s2 = yerr**2 + np.exp(2 * log_f) * model**2
        return -0.5 * np.sum((y - model) ** 2 / s2 + np.log(s2))

    xj, yj, yerrj = map(jnp.asarray, (x, y, yerr))

    def jx_log_prob(theta):
        m, b, log_f = theta[0], theta[1], theta[2]
        ok = (
            (-5.0 < m) & (m < 0.5)
            & (0.0 < b) & (b < 10.0)
            & (-10.0 < log_f) & (log_f < 1.0)
        )
        model = m * xj + b
        s2 = yerrj**2 + jnp.exp(2 * log_f) * model**2
        ll = -0.5 * jnp.sum((yj - model) ** 2 / s2 + jnp.log(s2))
        return jnp.where(ok, ll, -jnp.inf)

    nwalkers, ndim, nsteps = 32, 3, 5000
    p0 = np.array([-1.0, 4.5, -0.7]) + 1e-4 * rng.normal(
        size=(nwalkers, ndim)
    )

    ref = emcee.EnsembleSampler(nwalkers, ndim, np_log_prob)
    ref.run_mcmc(p0, nsteps, progress=False)
    ours = emcee_tpu.EnsembleSampler(nwalkers, ndim, jx_log_prob, seed=11)
    ours.run_mcmc(p0, nsteps)

    rf = ref.get_chain(flat=True, discard=1000, thin=5)
    of = np.asarray(ours.get_chain(flat=True, discard=1000, thin=5))
    ref_med = np.percentile(rf, 50, axis=0)
    our_med = np.percentile(of, 50, axis=0)
    ref_std = rf.std(axis=0)
    assert np.all(np.abs(ref_med - our_med) < 0.5 * ref_std), (
        ref_med,
        our_med,
    )

    ref_tau = emcee.autocorr.integrated_time(ref.get_chain(), quiet=True)
    our_tau = ours.get_autocorr_time(quiet=True)
    assert np.all(np.abs(ref_tau - our_tau) / ref_tau < 0.6), (
        ref_tau,
        our_tau,
    )


def test_integrated_time_matches_reference_exactly():
    """Same chain through both tau estimators: identical to float tolerance
    (same FFT-ACF + Sokal windowing algorithm)."""
    rng = np.random.default_rng(5)
    n, nw, nd = 4000, 8, 3
    x = np.empty((n, nw, nd))
    x[0] = rng.normal(size=(nw, nd))
    for i in range(1, n):
        x[i] = 0.9 * x[i - 1] + rng.normal(size=(nw, nd))

    ref_tau = emcee.autocorr.integrated_time(x, quiet=True)
    our_tau = emcee_tpu.autocorr.integrated_time(x, quiet=True)
    np.testing.assert_allclose(our_tau, ref_tau, rtol=1e-4)

    acf_ref = emcee.autocorr.function_1d(x[:, 0, 0])
    acf_ours = emcee_tpu.autocorr.function_1d(x[:, 0, 0])
    np.testing.assert_allclose(acf_ours, acf_ref, atol=1e-5)


def test_continue_reference_run(tmp_path):
    """The migration flow: a run started by reference emcee is continued
    by our sampler against the same file (constructor auto-resume), and
    reference emcee reads the extended chain back."""

    def np_log_prob(x):
        return -0.5 * np.sum(x**2)

    def jx_log_prob(x):
        return -0.5 * jnp.sum(x**2)

    fn = str(tmp_path / "migrate.h5")
    be_ref = emcee.backends.HDFBackend(fn)
    s_ref = emcee.EnsembleSampler(16, 2, np_log_prob, backend=be_ref)
    p0 = np.random.default_rng(2).normal(size=(16, 2))
    s_ref.run_mcmc(p0, 40, progress=False)
    ref_chain = s_ref.get_chain()

    ours = emcee_tpu.EnsembleSampler(
        16, 2, jx_log_prob, backend=emcee_tpu.backends.HDFBackend(fn)
    )
    assert ours.iteration == 40  # auto-resumed from the reference file
    ours.run_mcmc(None, 30)
    assert ours.iteration == 70
    full = np.asarray(ours.get_chain())
    np.testing.assert_allclose(full[:40], ref_chain, rtol=1e-6)
    assert np.all(np.isfinite(full))
    # Continued rows actually sample (walkers move).
    assert np.std(full[40:] - full[39]) > 0

    # Reference emcee reads the extended file.
    reader = emcee.backends.HDFBackend(fn, read_only=True)
    assert reader.iteration == 70
    chain_back = reader.get_chain()
    np.testing.assert_allclose(chain_back, full, rtol=1e-6)
    np.testing.assert_allclose(
        reader.get_last_sample().coords, full[-1], rtol=1e-6
    )
