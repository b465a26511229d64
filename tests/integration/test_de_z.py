"""DEZMove (DE-MC(Z), archive-based differential evolution) tests.

Standard statistical oracle plus the move's raison d'etre: correct
sampling with FEWER walkers than ``2 * ndim`` (the regime the
reference's red-blue guard forbids outright,
``red_blue.py:64-70``) once the archive supplies directions.
"""

import jax
import jax.numpy as jnp
import numpy as np

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
    assert carry["filled"] == 128  # 10 * 64 rows folded, capped
    assert carry["ptr"] == (10 * 64) % 128
    assert np.any(carry["z"] != 0.0)


def test_de_z_fewer_walkers_than_2ndim():
    """8 walkers in 10 dimensions: impossible for current-ensemble DE
    (complement spans at most 4 directions), fine for DE-MC(Z) once the
    archive has accumulated history."""
    nwalkers, ndim, nsteps = 8, 10, 8000
    s = EnsembleSampler(
        nwalkers, ndim, lambda x: -0.5 * jnp.sum(x**2),
        moves=moves.DEZMove(update_rows=8, live_dangerously=True),
        seed=1,
    )
    coords = np.random.default_rng(2).normal(size=(nwalkers, ndim))
    # 8 points in 10-D are always linearly dependent; the independence
    # check exists for the opposite (collapsed-ensemble) failure mode.
    s.run_mcmc(coords, nsteps, skip_initial_state_check=True)
    flat = np.asarray(s.get_chain(discard=nsteps // 2, flat=True))
    assert np.all(np.abs(flat.mean(axis=0)) < 0.15), flat.mean(axis=0)
    assert np.all(np.abs(flat.std(axis=0) - 1.0) < 0.12), flat.std(axis=0)
