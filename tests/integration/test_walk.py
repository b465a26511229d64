"""WalkMove integration tests (reference ``test_walk.py``)."""

from emcee_tpu import moves

from .test_proposal import _test_normal, _test_uniform


def test_normal_walk():
    _test_normal(moves.WalkMove(), nsteps=3000)


def test_normal_walk_subset():
    _test_normal(moves.WalkMove(s=3), nsteps=3000)


def test_uniform_walk():
    _test_uniform(moves.WalkMove())
