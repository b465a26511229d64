"""KDEMove integration tests (reference ``test_kde.py``)."""

from emcee_tpu import moves

from .test_proposal import _test_normal, _test_uniform


def test_normal_kde():
    _test_normal(moves.KDEMove())


def test_normal_kde_3d():
    _test_normal(moves.KDEMove(), ndim=3)


def test_uniform_kde():
    _test_uniform(moves.KDEMove())


def test_normal_kde_subsampled():
    _test_normal(moves.KDEMove(max_complement=12))
