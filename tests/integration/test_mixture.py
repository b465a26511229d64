"""Weighted move-mixture integration test.

The reference exercises mixtures through the moves tutorial (DE 0.8 +
Snooker 0.2, ``docs/tutorials/moves.ipynb``); here the same mixture must
sample a unit normal correctly through the ``lax.switch`` dispatch path.
"""

from emcee_tpu import moves

from .test_proposal import _test_normal


def test_de_snooker_mixture():
    _test_normal(
        [
            (moves.DEMove(), 0.8),
            (moves.DESnookerMove(), 0.2),
        ],
        ndim=3,
        nsteps=3000,
    )


def test_stretch_gaussian_mixture():
    _test_normal(
        [
            (moves.StretchMove(), 0.5),
            (moves.GaussianMove(0.5), 0.5),
        ],
        nsteps=3000,
    )


def test_de_snooker_mixture_blocked_roll():
    """Workload-3 performance configuration: blocked engine, roll pairing
    for both moves, fused RNG — statistically equivalent to the
    reference-faithful mixture."""
    _test_normal(
        [
            (moves.DEMove(pair_mode="roll", randomize_split=False), 0.8),
            (
                moves.DESnookerMove(
                    pair_mode="roll", randomize_split=False
                ),
                0.2,
            ),
        ],
        ndim=3,
        nsteps=3000,
    )


def test_blended_mixture():
    """BlendedMove: fused mixture (shared log-prob eval, no lax.switch)
    must pass the same oracle as the switch mixture."""
    _test_normal(
        moves.BlendedMove(
            [
                (moves.DEMove(pair_mode="roll"), 0.8),
                (
                    moves.DESnookerMove(pair_mode="roll", nsplits=2),
                    0.2,
                ),
            ],
            randomize_split=False,
        ),
        ndim=3,
        nsteps=3000,
    )


def test_blended_validation():
    import pytest

    with pytest.raises(ValueError):
        moves.BlendedMove([moves.DEMove()])
    with pytest.raises(ValueError):
        moves.BlendedMove([moves.DEMove(), moves.GaussianMove(0.5)])
    with pytest.raises(ValueError):
        moves.BlendedMove(
            [moves.DEMove(), moves.DESnookerMove()]
        )  # nsplits 2 vs 4


def test_blended_switch_mode():
    """mode='switch' computes one sub-proposal per step via a
    proposal-scoped lax.switch; same oracle."""
    _test_normal(
        moves.BlendedMove(
            [
                (moves.DEMove(pair_mode="roll"), 0.8),
                (moves.DESnookerMove(pair_mode="roll", nsplits=2), 0.2),
            ],
            mode="switch",
            randomize_split=False,
        ),
        ndim=3,
        nsteps=3000,
    )
