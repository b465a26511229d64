"""DESnookerMove integration tests (reference ``test_de_snooker.py``)."""

from emcee_tpu import moves

from .test_proposal import _test_normal, _test_uniform


def test_normal_de_snooker():
    _test_normal(moves.DESnookerMove(), nsteps=4000)


def test_uniform_de_snooker():
    _test_uniform(moves.DESnookerMove(), nsteps=4000)


def test_normal_de_snooker_roll_blocked():
    """The gather-free TPU performance configuration must pass the same
    statistical oracle."""
    _test_normal(
        moves.DESnookerMove(pair_mode="roll", randomize_split=False),
        nsteps=4000,
    )


def test_normal_de_snooker_roll_2split():
    """nsplits=2 roll variant (three shifted draws from one complement
    half) — same oracle, half the sub-steps."""
    _test_normal(
        moves.DESnookerMove(
            pair_mode="roll", nsplits=2, randomize_split=False
        ),
        nsteps=4000,
    )
