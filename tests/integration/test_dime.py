"""DIMEMove integration tests.

Same statistical oracle as the other moves (reference
``tests/integration/test_proposal.py:31-102``) plus the move's raison
d'etre: mode-hopping on a well-separated bimodal target, and adaptation
of the independence-proposal moments toward the target's.
"""

import jax
import jax.numpy as jnp
import numpy as np

from emcee_tpu import EnsembleSampler, moves

from .test_proposal import _test_normal, _test_uniform


def test_normal_dime():
    _test_normal(moves.DIMEMove())


def test_normal_dime_3d():
    _test_normal(moves.DIMEMove(), ndim=3)


def test_normal_dime_pure_independence():
    # aimh_prob=1: every walker proposes from the adapted t — the
    # independence-MH correction must hold on its own.  Acceptance goes
    # ~0.95 here because the adapted proposal nearly matches the target
    # (the ideal independence-sampler regime), so skip the local-move
    # acceptance window.
    _test_normal(
        moves.DIMEMove(aimh_prob=1.0), nsteps=3000, check_acceptance=False
    )


def test_uniform_dime():
    _test_uniform(moves.DIMEMove())


def test_dime_mode_hopping():
    """Two unit-normal modes 16 sigma apart: local ensemble moves almost
    never cross, but DIME's independence component re-balances the mode
    weights once the proposal has learned both (Boehl 2022's headline
    property)."""
    delta = 8.0
    nwalkers, ndim, nsteps = 64, 2, 1500

    def log_prob(x):
        a = -0.5 * jnp.sum((x - delta) ** 2)
        b = -0.5 * jnp.sum((x + delta) ** 2)
        return jnp.logaddexp(a, b)

    # Deliberately unbalanced start: 3/4 of walkers in the + mode.
    rng = np.random.default_rng(0)
    coords = rng.normal(size=(nwalkers, ndim)) * 0.5
    coords[: 3 * nwalkers // 4] += delta
    coords[3 * nwalkers // 4 :] -= delta

    sampler = EnsembleSampler(
        nwalkers, ndim, log_prob, moves=moves.DIMEMove(aimh_prob=0.2),
        seed=42,
    )
    sampler.run_mcmc(coords, nsteps)

    flat = np.asarray(sampler.get_chain(discard=nsteps // 2, flat=True))
    frac_plus = np.mean(flat[:, 0] > 0)
    # Equal-weight modes: the second-half chain should be near 50/50.
    assert 0.35 < frac_plus < 0.65, frac_plus
    # Both modes centered correctly.
    plus = flat[flat[:, 0] > 0]
    minus = flat[flat[:, 0] < 0]
    assert np.all(np.abs(plus.mean(axis=0) - delta) < 0.25)
    assert np.all(np.abs(minus.mean(axis=0) + delta) < 0.25)


def test_dime_carry_adapts_to_target():
    """After sampling, the carried proposal moments track the target."""
    nwalkers, ndim = 64, 3
    cov = np.array(
        [[1.0, 0.5, 0.0], [0.5, 2.0, 0.3], [0.0, 0.3, 0.7]]
    )
    icov = np.linalg.inv(cov)

    def log_prob(x):
        return -0.5 * x @ jnp.asarray(icov) @ x

    sampler = EnsembleSampler(
        nwalkers, ndim, log_prob, moves=moves.DIMEMove(), seed=3
    )
    coords = np.random.default_rng(1).normal(size=(nwalkers, ndim))
    sampler.run_mcmc(coords, 2000)

    carry = sampler._move_carries[0]
    mean = np.asarray(carry["mean"])
    cov_est = np.asarray(carry["cov"])
    assert np.all(np.abs(mean) < 0.3)
    assert np.all(np.abs(cov_est - cov) < 0.5)
    assert float(carry["w"]) > nwalkers  # history has accumulated


def test_normal_dime_blocked():
    # Gather-free fixed-split engine (the perf configuration).
    _test_normal(moves.DIMEMove(randomize_split=False))


def test_normal_dime_gaussian_proposal():
    # df=None: Gaussian independence proposal (no chi2 draws).
    _test_normal(
        moves.DIMEMove(aimh_prob=1.0, df=None),
        nsteps=3000,
        check_acceptance=False,
    )


def test_dime_off_center_target():
    """Regression: float32 raw-second-moment accumulation cancelled
    catastrophically when |mean| >> sigma (cov went indefinite -> NaN
    Cholesky -> every independence proposal silently rejected).  The
    centered recursion must sample an offset target exactly."""
    offset = 1.0e4
    nwalkers, ndim = 64, 2

    def log_prob(x):
        return -0.5 * jnp.sum((x - offset) ** 2)

    sampler = EnsembleSampler(
        nwalkers, ndim, log_prob, seed=21,
        moves=moves.DIMEMove(aimh_prob=1.0),
    )
    coords = offset + np.random.default_rng(5).normal(
        size=(nwalkers, ndim)
    )
    sampler.run_mcmc(coords, 1500)
    acc = np.asarray(sampler.acceptance_fraction)
    assert np.all(acc > 0.3), acc.mean()  # the chain must actually move
    flat = np.asarray(
        sampler.get_chain(discard=500, flat=True), dtype=np.float64
    )
    assert np.all(np.abs(flat.mean(axis=0) - offset) < 0.1)
    assert np.all(np.abs(flat.std(axis=0) - 1.0) < 0.1)
    cov = np.asarray(sampler._move_carries[0]["cov"])
    assert np.all(np.linalg.eigvalsh(cov) > 0)  # PSD, no cancellation
