"""DEZMove (DE-MC(Z), archive-based differential evolution) tests.

Standard statistical oracle plus the move's raison d'etre: correct
sampling with FEWER walkers than ``2 * ndim`` (the regime the
reference's red-blue guard forbids outright,
``red_blue.py:64-70``) once the archive supplies directions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emcee_tpu import EnsembleSampler, moves

from .test_proposal import _test_normal, _test_uniform


def test_normal_de_z():
    _test_normal(moves.DEZMove())


def test_normal_de_z_3d():
    _test_normal(moves.DEZMove(), ndim=3)


def test_uniform_de_z():
    _test_uniform(moves.DEZMove())


def test_de_z_archive_fills_and_wraps():
    nwalkers, ndim = 32, 2
    mv = moves.DEZMove(archive_size=128, update_rows=64)
    s = EnsembleSampler(nwalkers, ndim, lambda x: -0.5 * jnp.sum(x**2),
                        moves=mv, seed=0)
    coords = np.random.default_rng(0).normal(size=(nwalkers, ndim))
    s.run_mcmc(coords, 10)
    carry = jax.device_get(s._move_carries[0])
    assert carry["z"].shape == (128, ndim)
    # update_rows=64 clamps to the 32 distinct local walkers per update
    # (duplicate rows would enter the pool as zero difference vectors).
    assert carry["filled"] == 128  # 10 * 32 rows folded, capped
    assert carry["ptr"] == (10 * 32) % 128
    assert np.any(carry["z"] != 0.0)
    # The most recent write block (10th, at slot 32*9 % 128 = 32) holds
    # 32 distinct states — no duplicated walkers.
    last = carry["z"][32:64]
    assert len(np.unique(last, axis=0)) == 32


def test_de_z_fewer_walkers_than_2ndim():
    """8 walkers in 10 dimensions: impossible for current-ensemble DE
    (difference vectors span at most a 7-dim affine hull), possible for
    DE-MC(Z) because the additive de_noise term escapes the hull and the
    archive then accumulates hull-external directions.

    Regression guard: the chain must have full-rank variance — in
    particular along the directions ORTHOGONAL to the initial ensemble's
    affine hull, where a noise-free DE chain has exactly zero motion."""
    nwalkers, ndim, nsteps = 8, 10, 12000
    s = EnsembleSampler(
        nwalkers, ndim, lambda x: -0.5 * jnp.sum(x**2),
        moves=moves.DEZMove(
            update_rows=8, de_noise=0.1, live_dangerously=True
        ),
        seed=1,
    )
    coords = np.random.default_rng(2).normal(size=(nwalkers, ndim))
    # 8 points in 10-D are always linearly dependent; the independence
    # check exists for the opposite (collapsed-ensemble) failure mode.
    s.run_mcmc(coords, nsteps, skip_initial_state_check=True)
    flat = np.asarray(s.get_chain(discard=nsteps // 2, flat=True))
    assert np.all(np.abs(flat.mean(axis=0)) < 0.2), flat.mean(axis=0)
    assert np.all(np.abs(flat.std(axis=0) - 1.0) < 0.15), flat.std(axis=0)

    # Directions orthogonal to the initial affine hull (7-dim span of
    # 8 centered points -> 3 orthogonal directions).
    centered = coords - coords.mean(axis=0)
    _, sv, vt = np.linalg.svd(centered, full_matrices=True)
    ortho = vt[np.sum(sv > 1e-8):]  # (>=3, ndim)
    proj = flat @ ortho.T
    assert np.all(proj.std(axis=0) > 0.7), proj.std(axis=0)


def test_de_z_archive_seeded_skips_bootstrap():
    """Few-walker regime with a prior-seeded archive: difference vectors
    are full-rank from step one, so the slow de_noise random-walk
    bootstrap of the cold archive is skipped.  After a budget far too
    short for the cold chain to escape the initial affine hull, the
    seeded chain has already equilibrated along the orthogonal
    directions (measured ramp: cold reaches ~0.16/0.46/0.86 of the unit
    spread at 200/400/800 steps; seeded is >0.8 by 200)."""
    nwalkers, ndim, nsteps = 8, 10, 200
    coords = np.random.default_rng(2).normal(size=(nwalkers, ndim)) * 0.05
    prior_sample = np.random.default_rng(3).normal(
        size=(512, ndim)
    ) * 2.0  # over-dispersed prior draw, not the target

    def run(move):
        s = EnsembleSampler(
            nwalkers, ndim, lambda x: -0.5 * jnp.sum(x**2),
            moves=move, seed=1,
        )
        s.run_mcmc(coords, nsteps, skip_initial_state_check=True)
        return np.asarray(s.get_chain(discard=nsteps // 2, flat=True))

    common = dict(update_rows=8, de_noise=1e-2, live_dangerously=True)
    flat_cold = run(moves.DEZMove(**common))
    flat_seed = run(moves.DEZMove(archive_init=prior_sample, **common))

    # Directions orthogonal to the tiny initial hull.
    centered = coords - coords.mean(axis=0)
    _, sv, vt = np.linalg.svd(centered, full_matrices=True)
    ortho = vt[np.sum(sv > 1e-8):]
    std_cold = (flat_cold @ ortho.T).std(axis=0)
    std_seed = (flat_seed @ ortho.T).std(axis=0)
    # Seeded: near-unit spread along every orthogonal direction; cold:
    # still crawling out of the hull at this budget.
    assert np.all(std_seed > 0.7), std_seed
    assert std_cold.min() < 0.5 * std_seed.min(), (std_cold, std_seed)


def test_de_z_archive_init_validation():
    with pytest.raises(ValueError, match="archive_init"):
        moves.DEZMove(archive_init=np.zeros(5))
    move = moves.DEZMove(archive_init=np.zeros((4, 3)))
    with pytest.raises(ValueError, match="ndim"):
        move.init_carry(8, 2)
    carry = move.init_carry(8, 3)
    assert int(carry["filled"]) == 4
    assert int(carry["ptr"]) == 4


def test_de_z_pure_snooker():
    # snooker_prob=1: the snooker Metropolis factor must hold on its own.
    _test_normal(
        moves.DEZMove(snooker_prob=1.0), ndim=3, nsteps=3000
    )


def test_de_z_components_off():
    # All extras disabled: reduces to archive-augmented plain DE.
    _test_normal(
        moves.DEZMove(snooker_prob=0.0, g1_prob=0.0, de_noise=0.0)
    )
