"""Gradient-based moves (MALA, HMC) held to the standard statistical
oracle, plus their tau advantage on a smooth target and the tune hook.

No reference counterpart (emcee is gradient-free); these extend the move
family using JAX autodiff on the same wrapped log-prob every other move
evaluates.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import emcee_tpu
from emcee_tpu import EnsembleSampler, moves

from .test_proposal import _test_normal, _test_uniform


def test_mala_normal():
    _test_normal(moves.MALAMove(1.6), nsteps=3000)


def test_mala_uniform_sanity():
    _test_uniform(moves.MALAMove(1.6))


def test_hmc_normal():
    # The generic acceptance window targets random-walk moves; a good
    # symplectic integrator on a Gaussian accepts ~everything, which is
    # correct behavior — assert the moments/K-S only.
    _test_normal(
        moves.HMCMove(0.5, n_leapfrog=5),
        nsteps=2000,
        check_acceptance=False,
    )


def test_hmc_multidim():
    # jitter breaks the eps*L resonance (0.4*8 = 3.2 ~ half the unit
    # normal's period would make |x| mix glacially).
    _test_normal(
        moves.HMCMove(0.4, n_leapfrog=8, jitter=0.3),
        ndim=5,
        nsteps=2000,
        check_acceptance=False,
    )


def test_hmc_mixes_faster_than_stretch():
    """On a smooth 10-D normal, HMC's integrated autocorrelation time
    must beat the random-walk stretch move by a wide margin."""
    nwalkers, ndim, nsteps = 32, 10, 1500

    def lp(x):
        return -0.5 * jnp.sum(x**2)

    taus = {}
    for name, mv in (
        ("stretch", moves.StretchMove()),
        ("hmc", moves.HMCMove(0.4, n_leapfrog=8, jitter=0.3)),
    ):
        s = EnsembleSampler(nwalkers, ndim, lp, moves=mv, seed=0)
        coords = jax.random.normal(jax.random.key(1), (nwalkers, ndim))
        s.run_mcmc(coords, nsteps)
        taus[name] = float(
            np.max(np.asarray(s.get_autocorr_time(quiet=True)))
        )
    assert taus["hmc"] * 3 < taus["stretch"], taus


def test_chees_normal():
    """With tune off, ChEES-HMC is jittered fixed-T HMC: the standard
    statistical oracle must hold."""
    _test_normal(
        moves.ChEESHMCMove(0.5, trajectory_length=2.0),
        ndim=3,
        nsteps=2000,
        check_acceptance=False,
    )


def test_chees_production_skips_gradient_machinery():
    """wants_tune_flag contract: with tune=False the ChEES gradient is
    never estimated (the carry's pending gradient stays zero), while a
    tune=True run populates it."""

    def lp(x):
        return -0.5 * jnp.sum(x**2, axis=-1)

    p0 = np.random.default_rng(0).normal(size=(32, 2))
    s = EnsembleSampler(
        32, 2, lp,
        moves=moves.ChEESHMCMove(0.5, trajectory_length=1.0),
        vectorize=True, seed=0,
    )
    s.run_mcmc(p0, 10)  # production: no adaptation work
    assert float(s._move_carries[0]["g"]) == 0.0
    s.run_mcmc(None, 10, tune=True)
    # The tuned run estimated gradients (and adapted log_T off its
    # too-short initial value).
    carry = s._move_carries[0]
    assert float(carry["k"]) > 0
    assert float(np.abs(carry["log_T"])) != np.log(1.0) or float(
        carry["m"]
    ) != 0.0


def test_chees_adapts_trajectory_and_beats_fixed_l():
    """On an ill-conditioned diagonal Gaussian the ChEES criterion must
    stretch the trajectory length well past its (deliberately short)
    initial value, land acceptance near the 0.651 target, and out-mix a
    fixed-L HMC with the same step-size budget."""
    nd, nw = 8, 128
    scales = np.logspace(0, 1.5, nd)  # condition number 1e3
    sc = jnp.asarray(scales, dtype=jnp.float32)

    def lp(x):
        return -0.5 * jnp.sum((x / sc) ** 2, axis=-1)

    rng = np.random.default_rng(0)
    p0 = rng.normal(size=(nw, nd)) * scales

    taus = {}
    for name, mv in (
        ("chees", moves.ChEESHMCMove(0.25, trajectory_length=1.0)),
        (
            "fixed",
            moves.HMCMove(
                0.25, n_leapfrog=5, jitter=0.2, tune_target=0.651
            ),
        ),
    ):
        s = EnsembleSampler(nw, nd, lp, moves=mv, vectorize=True, seed=0)
        s.run_mcmc(p0, 700, tune=True)
        if name == "chees":
            carry = s._move_carries[0]
            T = float(np.exp(carry["log_T"]))
            assert T > 5.0, f"trajectory length failed to grow: T={T}"
        s.reset()  # keeps the adapted carry
        s.run_mcmc(None, 1500)
        taus[name] = float(
            np.max(np.asarray(s.get_autocorr_time(quiet=True)))
        )
        if name == "chees":
            acc = float(np.mean(s.acceptance_fraction))
            assert 0.5 < acc < 0.8, acc
            chain = np.asarray(
                s.get_chain(discard=300)
            ).reshape(-1, nd)
            np.testing.assert_allclose(
                chain.std(0) / scales, 1.0, atol=0.12
            )
    assert taus["chees"] * 2 < taus["fixed"], taus


def test_chees_validation():
    with pytest.raises(ValueError):
        moves.ChEESHMCMove(0.5, trajectory_length=0.0)
    with pytest.raises(ValueError):
        moves.ChEESHMCMove(0.5, max_leapfrog=0)
    with pytest.raises(ValueError):
        moves.ChEESHMCMove(0.5, adapt_rate=-1.0)


def test_chees_van_der_corput_stream():
    """The jitter stream is the base-2 van der Corput sequence."""
    from emcee_tpu.moves.gradient import _van_der_corput

    got = [
        float(_van_der_corput(jnp.asarray(n, dtype=jnp.int32)))
        for n in range(1, 9)
    ]
    np.testing.assert_allclose(
        got, [0.5, 0.25, 0.75, 0.125, 0.625, 0.375, 0.875, 0.0625]
    )


def test_mala_tune_target():
    """Robbins-Monro step-size adaptation drives acceptance toward the
    target from a deliberately bad initial step size."""
    nwalkers, ndim = 64, 3

    def lp(x):
        return -0.5 * jnp.sum(x**2)

    mv = moves.MALAMove(5.0, tune_target=0.574)  # far too large
    s = EnsembleSampler(nwalkers, ndim, lp, moves=mv, seed=0)
    coords = jax.random.normal(jax.random.key(1), (nwalkers, ndim))
    s.run_mcmc(coords, 800, tune=True)
    s.reset()  # keeps the adapted carry
    s.run_mcmc(None, 500)
    acc = float(np.mean(s.acceptance_fraction))
    assert 0.35 < acc < 0.8, acc


def test_gradient_moves_param_sharded_smoke():
    """Param sharding is supported: the gradient is computed from the
    shard-local partial log-prob and the dim reductions psum.  The exact
    matched-key equivalence oracle lives in test_param_sharding."""
    ndev = len(jax.devices())
    if ndev < 4:
        pytest.skip("needs >=4 devices")
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("walkers", "params"))

    def lp(x):
        return -0.5 * jnp.sum(x**2, axis=-1)

    s = EnsembleSampler(
        8, 4, lp, vectorize=True, moves=moves.MALAMove(0.5),
        mesh=mesh, param_axis="params", seed=0,
    )
    coords = np.random.default_rng(0).normal(size=(8, 4))
    s.run_mcmc(coords, 10)
    assert np.all(np.isfinite(np.asarray(s.get_chain())))


def test_gradient_move_validation():
    with pytest.raises(ValueError):
        moves.MALAMove(0.0)
    with pytest.raises(ValueError):
        moves.HMCMove(0.5, n_leapfrog=0)
    with pytest.raises(ValueError):
        moves.HMCMove(0.5, jitter=1.5)


def test_preconditioned_mala_on_correlated_target():
    """cov= preconditioning: on a strongly correlated Gaussian the
    preconditioned chain must recover the covariance and mix far faster
    than the unpreconditioned one."""
    ndim, nwalkers, nsteps = 8, 64, 1200
    rng = np.random.default_rng(3)
    A = rng.normal(size=(ndim, ndim)) / np.sqrt(ndim)
    cov = A @ A.T + 0.1 * np.eye(ndim)  # condition number O(100)
    icov = jnp.asarray(np.linalg.inv(cov), dtype=jnp.float32)

    def lp(x):
        return -0.5 * x @ icov @ x

    p0 = rng.normal(size=(nwalkers, ndim)) @ np.linalg.cholesky(cov).T

    taus = {}
    for name, mv in (
        ("plain", moves.MALAMove(0.2)),
        ("precond", moves.MALAMove(1.2, cov=cov)),
    ):
        s = EnsembleSampler(nwalkers, ndim, lp, moves=mv, seed=0)
        s.run_mcmc(p0, nsteps)
        taus[name] = float(
            np.max(np.asarray(s.get_autocorr_time(quiet=True, tol=0)))
        )
        if name == "precond":
            flat = np.asarray(s.get_chain(flat=True, discard=nsteps // 4))
            err = np.linalg.norm(
                np.cov(flat, rowvar=False) - cov
            ) / np.linalg.norm(cov)
            assert err < 0.15, err
    assert taus["precond"] * 3 < taus["plain"], taus


def test_preconditioned_hmc_diag():
    """Diagonal preconditioner on an anisotropic target."""
    ndim, nwalkers = 4, 64
    scales = jnp.asarray([0.1, 1.0, 10.0, 100.0])

    def lp(x):
        return -0.5 * jnp.sum((x / scales) ** 2)

    mv = moves.HMCMove(
        0.7, n_leapfrog=5, jitter=0.2, cov=np.asarray(scales) ** 2
    )
    s = EnsembleSampler(nwalkers, ndim, lp, moves=mv, seed=0)
    p0 = np.random.default_rng(0).normal(size=(nwalkers, ndim)) * np.asarray(
        scales
    )
    s.run_mcmc(p0, 1500)
    flat = np.asarray(s.get_chain(flat=True, discard=300))
    ratio = flat.std(axis=0) / np.asarray(scales)
    assert np.all(np.abs(ratio - 1) < 0.1), ratio
    tau = np.max(np.asarray(s.get_autocorr_time(quiet=True, tol=0)))
    assert tau < 10, tau


def test_precond_rejects_param_sharding():
    ndev = len(jax.devices())
    if ndev < 4:
        pytest.skip("needs >=4 devices")
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("walkers", "params"))

    def lp(x):
        return -0.5 * jnp.sum(x**2, axis=-1)

    s = EnsembleSampler(
        8, 4, lp, vectorize=True, moves=moves.MALAMove(0.5, cov=2.0),
        mesh=mesh, param_axis="params", seed=0,
    )
    coords = np.random.default_rng(0).normal(size=(8, 4))
    with pytest.raises(NotImplementedError):
        s.run_mcmc(coords, 2)


def test_mala_with_hard_prior_bounds():
    """The common bounded-prior pattern — jnp.where(inside, lp, -inf) —
    is safe with gradient moves: the -inf branch is a constant (zero
    cotangent), proposals that land outside get -inf log-prob and are
    rejected, and the chain stays finite and in bounds."""

    def lp(x):
        inside = jnp.all(jnp.abs(x) < 2.0)
        return jnp.where(inside, -0.5 * jnp.sum(x**2), -jnp.inf)

    s = EnsembleSampler(32, 2, lp, moves=moves.MALAMove(0.8), seed=0)
    p0 = np.random.default_rng(0).normal(size=(32, 2)) * 0.5
    s.run_mcmc(p0, 500)
    ch = np.asarray(s.get_chain())
    assert np.all(np.isfinite(ch))
    assert np.all(np.abs(ch) < 2.0)
    assert float(np.mean(s.acceptance_fraction)) > 0.3


def test_ensemble_mala_normal():
    """Ensemble-preconditioned MALA (complement-covariance metric) on
    the standard oracle."""
    _test_normal(
        moves.EnsembleMALAMove(1.2), ndim=3, nsteps=3000,
        check_acceptance=False,
    )


def test_ensemble_mala_affine_invariance():
    """The whole point: on a strongly correlated target, the ensemble
    metric adapts by itself — no cov= argument — and tau beats the
    stretch move while the covariance is recovered."""
    ndim, nwalkers, nsteps = 8, 64, 1500
    rng = np.random.default_rng(5)
    A = rng.normal(size=(ndim, ndim)) / np.sqrt(ndim)
    cov = A @ A.T + 0.1 * np.eye(ndim)  # condition number O(100)
    icov = jnp.asarray(np.linalg.inv(cov), dtype=jnp.float32)

    def lp(x):
        return -0.5 * x @ icov @ x

    p0 = rng.normal(size=(nwalkers, ndim)) @ np.linalg.cholesky(cov).T

    taus = {}
    for name, mv in (
        ("stretch", moves.StretchMove()),
        ("emala", moves.EnsembleMALAMove(1.0)),
    ):
        s = EnsembleSampler(nwalkers, ndim, lp, moves=mv, seed=0)
        s.run_mcmc(p0, nsteps)
        taus[name] = float(
            np.max(np.asarray(s.get_autocorr_time(quiet=True, tol=0)))
        )
        if name == "emala":
            flat = np.asarray(s.get_chain(flat=True, discard=nsteps // 4))
            err = np.linalg.norm(
                np.cov(flat, rowvar=False) - cov
            ) / np.linalg.norm(cov)
            assert err < 0.15, err
    assert taus["emala"] * 2 < taus["stretch"], taus


def test_ensemble_mala_rejects_param_sharding():
    ndev = len(jax.devices())
    if ndev < 4:
        pytest.skip("needs >=4 devices")
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("walkers", "params"))

    def lp(x):
        return -0.5 * jnp.sum(x**2, axis=-1)

    s = EnsembleSampler(
        16, 4, lp, vectorize=True, moves=moves.EnsembleMALAMove(0.8),
        mesh=mesh, param_axis="params", seed=0,
    )
    coords = np.random.default_rng(0).normal(size=(16, 4))
    with pytest.raises(NotImplementedError):
        s.run_mcmc(coords, 2)


def test_gradient_move_rejects_host_callback():
    """host_callback log-probs have no JVP; the error must be clear."""

    def np_lp(x):
        return -0.5 * float(np.sum(np.asarray(x) ** 2))

    s = EnsembleSampler(
        16, 2, np_lp, host_callback=True, moves=moves.MALAMove(0.5),
        seed=0,
    )
    coords = np.random.default_rng(0).normal(size=(16, 2))
    with pytest.raises(NotImplementedError, match="differentiable"):
        s.run_mcmc(coords, 2)


def test_cov_validation():
    with pytest.raises(ValueError):
        moves.MALAMove(0.5, cov=-1.0)
    with pytest.raises(ValueError):
        moves.HMCMove(0.5, cov=np.array([1.0, -2.0]))
    with pytest.raises(ValueError):
        moves.MALAMove(0.5, cov=np.array([1.0, np.nan]))
    with pytest.raises(np.linalg.LinAlgError):
        moves.MALAMove(0.5, cov=-np.eye(2))  # non-PD matrix fails loudly


def test_ensemble_hmc_normal():
    """Ensemble-preconditioned HMC (complement-covariance mass matrix)
    on the standard oracle."""
    _test_normal(
        moves.EnsembleHMCMove(0.5, n_leapfrog=4),
        ndim=3,
        nsteps=2000,
        check_acceptance=False,
    )


def test_ensemble_hmc_affine_invariance():
    """Zero-config HMC on a strongly correlated target: the ensemble
    mass matrix whitens it, tau approaches 1, and the covariance is
    recovered — the hand-preconditioned HMCMove(cov=...) behavior with
    no cov argument."""
    ndim, nwalkers, nsteps = 8, 64, 800
    rng = np.random.default_rng(5)
    A = rng.normal(size=(ndim, ndim)) / np.sqrt(ndim)
    cov = A @ A.T + 0.1 * np.eye(ndim)
    icov = jnp.asarray(np.linalg.inv(cov), dtype=jnp.float32)

    def lp(x):
        return -0.5 * x @ icov @ x

    p0 = rng.normal(size=(nwalkers, ndim)) @ np.linalg.cholesky(cov).T
    s = EnsembleSampler(
        nwalkers, ndim, lp,
        moves=moves.EnsembleHMCMove(0.4, n_leapfrog=5), seed=0,
    )
    s.run_mcmc(p0, nsteps)
    assert float(np.mean(s.acceptance_fraction)) > 0.6
    tau = float(np.max(np.asarray(s.get_autocorr_time(quiet=True, tol=0))))
    assert tau < 10.0, tau
    flat = np.asarray(s.get_chain(flat=True, discard=nsteps // 4))
    err = np.linalg.norm(
        np.cov(flat, rowvar=False) - cov
    ) / np.linalg.norm(cov)
    assert err < 0.15, err


def test_ensemble_hmc_rejects_param_sharding():
    ndev = len(jax.devices())
    if ndev < 4:
        pytest.skip("needs >=4 devices")
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("walkers", "params"))

    def lp(x):
        return -0.5 * jnp.sum(x**2, axis=-1)

    s = EnsembleSampler(
        16, 4, lp, vectorize=True, moves=moves.EnsembleHMCMove(0.4),
        mesh=mesh, param_axis="params", seed=0,
    )
    coords = np.random.default_rng(0).normal(size=(16, 4))
    with pytest.raises(NotImplementedError):
        s.run_mcmc(coords, 2)


def test_ensemble_hmc_validation():
    with pytest.raises(ValueError):
        moves.EnsembleHMCMove(step_size=-1.0)
    with pytest.raises(ValueError):
        moves.EnsembleHMCMove(n_leapfrog=0)
    with pytest.raises(ValueError):
        moves.EnsembleHMCMove(jitter=1.5)
