"""DESnookerMove integration tests (reference ``test_de_snooker.py``)."""

from emcee_tpu import moves

from .test_proposal import _test_normal, _test_uniform


def test_normal_de_snooker():
    _test_normal(moves.DESnookerMove(), nsteps=4000)


def test_uniform_de_snooker():
    _test_uniform(moves.DESnookerMove(), nsteps=4000)
