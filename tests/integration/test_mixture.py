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


def test_mixture_block_schedule():
    """mixture_block=4: the move is drawn once per block of 4 kept steps
    (amortizing the lax.switch dispatch).  A state-independent schedule of
    π-invariant kernels must pass the same oracle."""
    _test_normal(
        [
            (moves.DEMove(pair_mode="roll", randomize_split=False), 0.8),
            (
                moves.DESnookerMove(
                    pair_mode="roll", nsplits=2, randomize_split=False
                ),
                0.2,
            ),
        ],
        ndim=3,
        nsteps=3000,
        mixture_block=4,
    )


def test_mixture_block_validation_and_fallback():
    import jax
    import numpy as np
    import pytest

    from emcee_tpu import EnsembleSampler, State

    with pytest.raises(ValueError):
        EnsembleSampler(
            8, 2, lambda x: -0.5 * sum(x**2), mixture_block=0
        )
    # nkeep not a block multiple -> per-proposal fallback still runs.
    import jax.numpy as jnp

    s = EnsembleSampler(
        32,
        2,
        lambda x: -0.5 * jnp.sum(x**2, axis=-1),
        vectorize=True,
        moves=[(moves.DEMove(), 0.5), (moves.StretchMove(), 0.5)],
        mixture_block=7,
        seed=0,
    )
    coords = np.random.default_rng(0).normal(size=(32, 2))
    s.run_mcmc(
        State(jnp.asarray(coords), random_state=jax.random.key(1)), 10
    )
    assert s.get_chain().shape == (10, 32, 2)


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


def test_mixture_block_chunk_schedule():
    """The io-derived chunk schedule must round to block multiples so the
    blocked path engages (a non-multiple chunk silently falls back)."""
    import jax.numpy as jnp

    from emcee_tpu import EnsembleSampler

    def lp(x):
        return -0.5 * jnp.sum(x**2, axis=-1)

    mix = [(moves.DEMove(), 0.8), (moves.DESnookerMove(), 0.2)]
    s = EnsembleSampler(
        32, 2, lp, vectorize=True, moves=mix, mixture_block=32, seed=0
    )
    assert s._chunk_schedule(100, 25) == [32, 32, 32, 4]
    assert s._chunk_schedule(64, 100) == [64]
    assert s._chunk_schedule(10, 100) == [10]  # < one block: fallback
    # single move: schedule unaffected by mixture_block
    s1 = EnsembleSampler(32, 2, lp, vectorize=True, mixture_block=32, seed=0)
    assert s1._chunk_schedule(100, 25) == [25, 25, 25, 25]

    # End-to-end: io-limited chunks with a ragged tail still store the
    # full chain correctly through the blocked path.
    import numpy as np

    s2 = EnsembleSampler(
        32, 2, lp, vectorize=True, moves=mix, mixture_block=8,
        io_chunk_bytes=32 * 5 * 4 * 6, seed=0,  # ~6 kept steps per chunk
    )
    s2.run_mcmc(np.random.default_rng(0).normal(size=(32, 2)), 20)
    chain = np.asarray(s2.get_chain())
    assert chain.shape == (20, 32, 2)
    assert np.all(np.isfinite(chain))
