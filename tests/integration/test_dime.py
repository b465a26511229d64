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


# -- multi-component proposal (n_components > 1) -------------------------

SEP, S_SMALL = 6.0, 0.2


def lp_asym_bimodal(x):
    """Two well-separated modes of very unequal scale: wide N(-SEP, 1)
    and narrow N(+SEP, S_SMALL^2) with equal mass."""
    d = x.shape[-1]
    a = -0.5 * jnp.sum((x + SEP) ** 2)
    b = (
        -0.5 * jnp.sum((x - SEP) ** 2) / S_SMALL**2
        - d * jnp.log(S_SMALL)
    )
    return jnp.logaddexp(a, b)


def _asym_start(nw, d, rng):
    return np.concatenate(
        [
            rng.normal(size=(nw // 2, d)) - SEP,
            rng.normal(size=(nw // 2, d)) * S_SMALL + SEP,
        ]
    )


def test_normal_dime_mixture_components():
    # K > 1 on a unimodal target must not regress the standard oracle.
    _test_normal(moves.DIMEMove(n_components=2))
    _test_normal(moves.DIMEMove(n_components=3), ndim=3)


def test_dime_mixture_recovers_asymmetric_bimodal_tau():
    """The round-4 criterion: one global Student-t mis-serves two modes
    of unequal shape (its spread is dominated by the separation, so
    draws rarely land inside the narrow mode) — tau degrades >=5x vs
    the unimodal baseline; the K=2 mixture recovers to <=2.5x.
    Measured: uni 4.2, K=1 bimodal ~112 (27x), K=2 bimodal ~6.2 (1.5x).
    """
    from emcee_tpu.ops import autocorr

    nw, d, nsteps = 64, 3, 3000
    rng = np.random.default_rng(0)
    p0 = _asym_start(nw, d, rng)

    def tau_of(move, lp, p0):
        s = EnsembleSampler(nw, d, lp, moves=move, seed=0)
        s.run_mcmc(p0, nsteps)
        chain = np.asarray(s.get_chain(discard=nsteps // 3))
        return float(
            np.max(autocorr.integrated_time(chain, quiet=True))
        )

    tau_uni = tau_of(
        moves.DIMEMove(aimh_prob=0.3),
        lambda x: -0.5 * jnp.sum(x**2),
        rng.normal(size=(nw, d)),
    )
    tau_single = tau_of(moves.DIMEMove(aimh_prob=0.3), lp_asym_bimodal, p0)
    tau_mix = tau_of(
        moves.DIMEMove(aimh_prob=0.3, n_components=2), lp_asym_bimodal, p0
    )
    assert tau_single > 5.0 * tau_uni, (tau_uni, tau_single)
    assert tau_mix < 2.5 * tau_uni, (tau_uni, tau_mix)


def test_dime_mixture_samples_asymmetric_modes_correctly():
    """Mode masses and the narrow mode's scale are both right — the
    exactness of the mixture-density MH factor in practice."""
    nw, d, nsteps = 64, 2, 4000
    rng = np.random.default_rng(1)
    p0 = _asym_start(nw, d, rng)
    s = EnsembleSampler(
        nw, d, lp_asym_bimodal,
        moves=moves.DIMEMove(aimh_prob=0.3, n_components=2), seed=2,
    )
    s.run_mcmc(p0, nsteps)
    flat = np.asarray(s.get_chain(discard=nsteps // 2, flat=True))
    in_narrow = flat[:, 0] > 0
    frac = in_narrow.mean()
    assert abs(frac - 0.5) < 0.06, frac
    narrow = flat[in_narrow]
    wide = flat[~in_narrow]
    assert np.all(np.abs(narrow.mean(0) - SEP) < 0.05), narrow.mean(0)
    assert np.all(
        np.abs(narrow.std(0) - S_SMALL) < 0.05
    ), narrow.std(0)
    assert np.all(np.abs(wide.mean(0) + SEP) < 0.25), wide.mean(0)
    assert np.all(np.abs(wide.std(0) - 1.0) < 0.25), wide.std(0)


def test_dime_mixture_pure_independence():
    # aimh_prob=1 with K=2: the mixture-density MH factor stands alone.
    nw, d, nsteps = 64, 2, 3000
    rng = np.random.default_rng(3)
    p0 = _asym_start(nw, d, rng)
    s = EnsembleSampler(
        nw, d, lp_asym_bimodal,
        moves=moves.DIMEMove(aimh_prob=1.0, n_components=2), seed=4,
    )
    s.run_mcmc(p0, nsteps)
    flat = np.asarray(s.get_chain(discard=nsteps // 2, flat=True))
    frac = (flat[:, 0] > 0).mean()
    assert abs(frac - 0.5) < 0.06, frac


def test_dime_mixture_validation():
    import pytest

    with pytest.raises(ValueError, match="n_components"):
        moves.DIMEMove(n_components=0)
    carry = moves.DIMEMove(n_components=3).init_carry(16, 2)
    assert carry["mean"].shape == (3, 2)
    assert carry["cov"].shape == (3, 2, 2)
    assert carry["w"].shape == (3,)
