"""DEMove integration tests (reference ``test_de.py``)."""

from emcee_tpu import moves

from .test_proposal import _test_normal, _test_uniform


def test_normal_de():
    _test_normal(moves.DEMove())


def test_normal_de_no_gamma():
    _test_normal(moves.DEMove(gamma0=1.0))


def test_uniform_de():
    _test_uniform(moves.DEMove())


def test_normal_de_3d():
    _test_normal(moves.DEMove(), ndim=3)


def test_normal_de_roll_blocked():
    _test_normal(moves.DEMove(randomize_split=False, pair_mode="roll"))
