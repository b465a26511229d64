"""SideMove integration tests (Chen 2025-style Gaussianized DE; no
reference counterpart — validated against the same statistical oracle)."""

from emcee_tpu import moves

from .test_proposal import _test_normal, _test_uniform


def test_normal_side():
    _test_normal(moves.SideMove(), nsteps=3000)


def test_normal_side_roll_blocked():
    _test_normal(
        moves.SideMove(pair_mode="roll", randomize_split=False),
        nsteps=3000,
    )


def test_uniform_side():
    _test_uniform(moves.SideMove(), nsteps=2000)
