"""GaussianMove integration tests (reference ``test_gaussian.py``)."""

from itertools import product

import numpy as np
import pytest

from emcee_tpu import moves

from .test_proposal import _test_normal, _test_uniform


@pytest.mark.parametrize("mode,factor", product(["vector"], [None, 2.0, 5.0]))
def test_normal_gaussian(mode, factor):
    _test_normal(moves.GaussianMove(0.5, mode=mode, factor=factor))


@pytest.mark.parametrize(
    "mode,factor", product(["vector", "random", "sequential"], [None, 2.0])
)
def test_normal_gaussian_nd(mode, factor):
    ndim = 3
    nsteps = 8000

    # Isotropic.
    _test_normal(
        moves.GaussianMove(0.5, factor=factor, mode=mode),
        ndim=ndim,
        nsteps=nsteps,
    )
    # Axis-aligned.
    _test_normal(
        moves.GaussianMove(0.5 * np.ones(ndim), factor=factor, mode=mode),
        ndim=ndim,
        nsteps=nsteps,
    )
    # Dimension mismatch must raise.
    with pytest.raises(ValueError):
        _test_normal(
            moves.GaussianMove(
                0.5 * np.ones(ndim - 1), factor=factor, mode=mode
            ),
            ndim=ndim,
            nsteps=nsteps,
        )
    # Full matrix (vector mode only).
    if mode == "vector":
        _test_normal(
            moves.GaussianMove(np.diag(0.5 * np.ones(ndim)), mode=mode),
            ndim=ndim,
            nsteps=nsteps,
        )


def test_invalid_gaussian_modes():
    with pytest.raises(ValueError):
        moves.GaussianMove(0.5, mode="not-a-mode")
    with pytest.raises(ValueError):
        moves.GaussianMove(np.eye(3), mode="random")
    with pytest.raises(ValueError):
        moves.GaussianMove(0.5, factor=0.5)
    with pytest.raises(ValueError):
        moves.GaussianMove(np.ones((2, 3)))


def test_uniform_gaussian():
    _test_uniform(moves.GaussianMove(0.5))
