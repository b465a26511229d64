"""StretchMove integration tests (reference ``test_stretch.py``)."""

import pytest

from emcee_tpu import moves

from .test_proposal import _test_normal, _test_uniform


@pytest.mark.parametrize("blobs", [True, False])
@pytest.mark.parametrize("nsplits", [2, 5])
def test_normal_stretch(blobs, nsplits):
    _test_normal(
        moves.StretchMove(nsplits=nsplits), nwalkers=40, blobs=blobs
    )


def test_normal_stretch_no_randomize():
    _test_normal(moves.StretchMove(randomize_split=False))


def test_uniform_stretch():
    _test_uniform(moves.StretchMove())


def test_nsplits_stretch_ndim():
    _test_normal(moves.StretchMove(nsplits=4), ndim=3, nwalkers=32)


def test_normal_stretch_roll_blocked():
    """The TPU performance configuration must pass the statistical oracle."""
    _test_normal(
        moves.StretchMove(randomize_split=False, pair_mode="roll")
    )


def test_uniform_stretch_roll():
    _test_uniform(moves.StretchMove(pair_mode="roll"))


def test_normal_stretch_rbg_prng():
    """The bench.py headline configuration's hardware-RNG key impl
    (prng="rbg") must pass the same statistical oracle as threefry."""
    _test_normal(
        moves.StretchMove(randomize_split=False, pair_mode="roll"),
        nsteps=3000,
        prng="rbg",
    )
