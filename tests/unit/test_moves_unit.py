"""Move unit tests with a stub model (reference ``tests/unit/test_stretch.py``).

Each move's ``propose`` runs against a trivial model in isolation and must
produce correctly-shaped, finite output and valid accept vectors.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emcee_tpu import State, moves
from emcee_tpu.model import Model


def stub_model(nwalkers):
    return Model(
        compute_log_prob=lambda q: (jnp.zeros(q.shape[0]), None),
        axis_name=None,
        nwalkers=nwalkers,
    )


def make_state(nwalkers=32, ndim=3, seed=0):
    key = jax.random.key(seed)
    coords = jax.random.normal(key, (nwalkers, ndim))
    return State(
        coords=coords,
        log_prob=jnp.zeros(nwalkers),
        random_state=jax.random.key(seed + 1),
    )


ALL_MOVES = [
    moves.StretchMove(),
    moves.StretchMove(randomize_split=False),
    moves.StretchMove(pair_mode="roll"),
    moves.StretchMove(nsplits=4),
    moves.WalkMove(),
    moves.WalkMove(s=5),
    moves.DEMove(),
    moves.DEMove(pair_mode="roll"),
    moves.DESnookerMove(),
    moves.KDEMove(),
    moves.GaussianMove(0.25),
    moves.GaussianMove(0.25, mode="random"),
    moves.GaussianMove(0.25, mode="sequential"),
    moves.GaussianMove(0.25 * np.ones(3)),
    moves.GaussianMove(np.diag(0.25 * np.ones(3))),
    moves.MHMove(
        lambda key, x: (
            x + 0.1 * jax.random.normal(key, x.shape),
            jnp.zeros(x.shape[0]),
        )
    ),
]


@pytest.mark.parametrize(
    "move", ALL_MOVES, ids=[type(m).__name__ + f"_{i}" for i, m in enumerate(ALL_MOVES)]
)
def test_propose_contract(move):
    nwalkers, ndim = 32, 3
    state = make_state(nwalkers, ndim)
    model = stub_model(nwalkers)
    carry = move.init_carry(nwalkers, ndim)
    key = jax.random.key(5)

    new_state, accepted, carry = jax.jit(
        lambda k, s, c: move.propose(k, s, model, c)
    )(key, state, carry)

    assert new_state.coords.shape == (nwalkers, ndim)
    assert new_state.log_prob.shape == (nwalkers,)
    assert accepted.shape == (nwalkers,)
    assert accepted.dtype == bool
    assert np.all(np.isfinite(np.asarray(new_state.coords)))
    # With a flat target every non-shrinking proposal is acceptable;
    # something must move over a few proposals.
    total = np.asarray(accepted).sum()
    assert 0 <= total <= nwalkers


def test_rejected_walkers_keep_position():
    """Where accepted is False, coordinates must be unchanged."""
    nwalkers, ndim = 32, 3
    state = make_state(nwalkers, ndim)
    # A target that rejects everything: -inf for any proposal move.
    model = Model(
        compute_log_prob=lambda q: (
            jnp.full(q.shape[0], -jnp.inf),
            None,
        ),
        axis_name=None,
        nwalkers=nwalkers,
    )
    move = moves.StretchMove()
    new_state, accepted, _ = move.propose(
        jax.random.key(0), state, model, ()
    )
    assert not np.any(np.asarray(accepted))
    np.testing.assert_array_equal(
        np.asarray(new_state.coords), np.asarray(state.coords)
    )


def test_red_blue_guard():
    state = make_state(nwalkers=4, ndim=3)
    model = stub_model(4)
    with pytest.raises(RuntimeError):
        moves.StretchMove().propose(jax.random.key(0), state, model, ())
    # live_dangerously suppresses it
    moves.StretchMove(live_dangerously=True).propose(
        jax.random.key(0), state, model, ()
    )


def test_nsplits_divisibility_guard():
    state = make_state(nwalkers=30, ndim=3)
    model = stub_model(30)
    with pytest.raises(ValueError):
        moves.StretchMove(nsplits=4).propose(
            jax.random.key(0), state, model, ()
        )


def test_gaussian_sequential_carry_cycles():
    nwalkers, ndim = 16, 3
    move = moves.GaussianMove(0.25, mode="sequential")
    state = make_state(nwalkers, ndim)
    model = stub_model(nwalkers)
    carry = move.init_carry(nwalkers, ndim)
    seen = []
    for i in range(4):
        prev = np.asarray(state.coords).copy()
        state, accepted, carry = move.propose(
            jax.random.fold_in(jax.random.key(0), i), state, model, carry
        )
        changed = np.asarray(state.coords) != prev
        # Only a single dimension may change per proposal.
        dims = set(np.nonzero(changed.any(axis=0))[0].tolist())
        assert len(dims) <= 1
        seen.append(int(carry["index"]))
    assert seen == [1, 2, 0, 1]  # cycles mod ndim


def test_kde_logpdf_matches_scipy():
    """KDE factor computation must agree with scipy.stats.gaussian_kde."""
    scipy_stats = pytest.importorskip("scipy.stats")

    rng = np.random.default_rng(0)
    c = rng.normal(size=(40, 3))
    x = rng.normal(size=(7, 3))

    kde = scipy_stats.gaussian_kde(c.T)  # Scott's rule
    expected = kde.logpdf(x.T)

    from emcee_tpu.moves.kde import KDEMove

    move = KDEMove()
    factor = move._factor(c.shape[0], c.shape[1])
    cc = c - c.mean(0)
    kcov = factor**2 * (cc.T @ cc) / (c.shape[0] - 1)
    chol = np.linalg.cholesky(kcov)
    got = np.asarray(
        KDEMove._logpdf(
            jnp.asarray(x, jnp.float64)
            if jax.config.jax_enable_x64
            else jnp.asarray(x, jnp.float32),
            jnp.asarray(c, jnp.float32),
            jnp.asarray(chol, jnp.float32),
        )
    )
    np.testing.assert_allclose(got, expected, rtol=2e-4)


def test_gaussian_tune_targets_acceptance():
    """tune=True drives acceptance toward tune_target."""
    from emcee_tpu import EnsembleSampler

    def lp(x):
        return -0.5 * jnp.sum(x**2)

    nw, nd = 32, 4
    # Grossly oversized proposal: untuned acceptance would be tiny.
    move = moves.GaussianMove(25.0, tune_target=0.3)
    s = EnsembleSampler(nw, nd, lp, moves=move, seed=0)
    p0 = np.random.default_rng(0).normal(size=(nw, nd))
    s.run_mcmc(p0, 1500, tune=True)
    acc_late = np.asarray(s.backend.accepted, dtype=float)
    # Overall acceptance includes the bad early phase; check a fresh
    # window by continuing and differencing.
    before = s.backend.accepted.copy()
    s.run_mcmc(None, 500, tune=True)
    late = (s.backend.accepted - before) / 500.0
    assert 0.15 < late.mean() < 0.45, late.mean()


def test_gaussian_untuned_oversized_is_stuck():
    """Control: without tuning the oversized proposal barely accepts."""
    from emcee_tpu import EnsembleSampler

    def lp(x):
        return -0.5 * jnp.sum(x**2)

    nw, nd = 32, 4
    s = EnsembleSampler(nw, nd, lp, moves=moves.GaussianMove(25.0), seed=0)
    p0 = np.random.default_rng(0).normal(size=(nw, nd))
    s.run_mcmc(p0, 500)
    assert s.acceptance_fraction.mean() < 0.05


def test_walk_subset_scales_to_large_ensembles():
    """The subset path must not materialize O(nw * nc) permutations: a
    1e4-walker subset step completes and proposes finite, distinct
    coordinates (bootstrap path, nc > exact_subset_max)."""
    import jax.numpy as jnp
    from emcee_tpu.kernels import build_kernel
    from emcee_tpu.moves import WalkMove

    nw, nd = 10_000, 3

    def lp(x):
        return -0.5 * jnp.sum(x**2)

    mv = WalkMove(s=32)
    init, step = build_kernel(lp, nwalkers=nw, move=mv)
    coords = jax.random.normal(jax.random.key(0), (nw, nd))
    state, carry = init(coords, jax.random.key(1))
    state, accepted, carry = jax.jit(step)(state, carry)
    q = np.asarray(state.coords)
    assert np.all(np.isfinite(q))
    acc = np.asarray(accepted).mean()
    assert 0.05 < acc < 0.99


def test_red_blue_tune_targets_acceptance():
    """Ensemble-move tuning: a grossly over-stretched StretchMove and an
    oversized DEMove adapt toward the target acceptance under tune=True,
    and the adapted scale persists across runs (reference stateful-move
    semantics)."""
    from emcee_tpu import EnsembleSampler

    def lp(x):
        return -0.5 * jnp.sum(x**2)

    nw, nd = 32, 4
    p0 = np.random.default_rng(0).normal(size=(nw, nd))
    for mv, untuned_max in [
        (moves.StretchMove(a=60.0, tune_target=0.3), 0.15),
        (moves.DEMove(gamma0=8.0, tune_target=0.3), 0.15),
        (moves.SideMove(sigma=20.0, tune_target=0.3), 0.15),
    ]:
        s = EnsembleSampler(nw, nd, lp, moves=mv, seed=0)
        s.run_mcmc(p0, 1500, tune=True)
        before = s.backend.accepted.copy()
        s.run_mcmc(None, 500, tune=True)
        late = (s.backend.accepted - before) / 500.0
        assert 0.15 < late.mean() < 0.45, (type(mv).__name__, late.mean())
        # Adapted carry persists with tune=False (no further adaptation).
        before = s.backend.accepted.copy()
        s.run_mcmc(None, 300)
        fixed = (s.backend.accepted - before) / 300.0
        assert 0.1 < fixed.mean() < 0.5, (type(mv).__name__, fixed.mean())

        # Control: untuned, the oversized proposal stays stuck.
        mv2 = type(mv)(
            **{
                "StretchMove": {"a": 60.0},
                "DEMove": {"gamma0": 8.0},
                "SideMove": {"sigma": 20.0},
            }[type(mv).__name__]
        )
        s2 = EnsembleSampler(nw, nd, lp, moves=mv2, seed=0)
        s2.run_mcmc(p0, 500)
        assert s2.acceptance_fraction.mean() < untuned_max, type(mv).__name__


def test_red_blue_tune_validation():
    """Moves without an adaptable scale reject tune_target loudly."""
    with pytest.raises(ValueError):
        moves.KDEMove(tune_target=0.3)
    with pytest.raises(ValueError):
        moves.BlendedMove(
            [moves.DEMove(), moves.DEMove(sigma=1e-3)], tune_target=0.3
        )


def test_red_blue_tuned_sampling_is_correct():
    """After a tuned burn-in, fixed-scale sampling passes the moment
    oracle (diminishing adaptation; samples drawn post-tune)."""
    from emcee_tpu import EnsembleSampler

    def lp(x):
        return -0.5 * jnp.sum(x**2)

    nw, nd = 32, 2
    p0 = np.random.default_rng(1).normal(size=(nw, nd))
    s = EnsembleSampler(
        nw, nd, lp, moves=moves.StretchMove(a=10.0, tune_target=0.35),
        seed=3,
    )
    st = s.run_mcmc(p0, 800, tune=True)
    s.reset()
    s.run_mcmc(st, 3000)
    samps = np.asarray(s.get_chain(flat=True))
    assert np.all(np.abs(samps.mean(axis=0)) < 0.08)
    assert np.all(np.abs(samps.std(axis=0) - 1) < 0.05)


def test_ensemble_mala_tune_targets_acceptance():
    """EnsembleMALAMove inherits the red-blue scale tuner: a grossly
    oversized step adapts toward the target under tune=True."""
    from emcee_tpu import EnsembleSampler

    def lp(x):
        return -0.5 * jnp.sum(x**2)

    nw, nd = 32, 4
    p0 = np.random.default_rng(0).normal(size=(nw, nd))
    s = EnsembleSampler(
        nw, nd, lp,
        moves=moves.EnsembleMALAMove(8.0, tune_target=0.5), seed=0,
    )
    s.run_mcmc(p0, 1500, tune=True)
    before = s.backend.accepted.copy()
    s.run_mcmc(None, 500, tune=True)
    late = (s.backend.accepted - before) / 500.0
    assert 0.3 < late.mean() < 0.7, late.mean()

    # Control: untuned, the oversized step stays stuck.
    s2 = EnsembleSampler(
        nw, nd, lp, moves=moves.EnsembleMALAMove(8.0), seed=0
    )
    s2.run_mcmc(p0, 500)
    assert s2.acceptance_fraction.mean() < 0.1


def test_kernels_api_adaptive_moves():
    """build_kernel supports shape-dependent carries (DIME moments, DEZ
    archive) by building the carry from the initial coords' ndim."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from emcee_tpu import kernels, moves

    def lp(x):
        return -0.5 * jnp.sum(x**2)

    for mv in [moves.DIMEMove(), moves.DEZMove(update_rows=8)]:
        init, step = kernels.build_kernel(lp, 32, move=mv)
        state, carry = init(
            np.random.default_rng(0).normal(size=(32, 3)),
            jax.random.key(0),
        )

        def body(c, _):
            st, cr = c
            st, acc, cr = step(st, cr)
            return (st, cr), acc

        (state, carry), accs = jax.lax.scan(
            body, (state, carry), None, length=100
        )
        assert np.all(np.isfinite(np.asarray(state.coords)))
        assert 0.05 < float(jnp.mean(accs)) < 0.95


def test_de_z_archive_covers_all_walkers():
    """Regression: the archive subsample base must advance by one walker
    per update (advancing by the write pointer — a multiple of the
    stride — pinned the subsample to one residue class forever)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from emcee_tpu.model import Model
    from emcee_tpu.moves import DEZMove
    from emcee_tpu.state import State

    nw, nd = 16, 2
    mv = DEZMove(update_rows=4, archive_size=1024)
    carry = mv.init_carry(nw, nd)
    model = Model(compute_log_prob=None, nwalkers=nw)
    # Coords encode the walker id so archived rows are identifiable.
    coords = jnp.arange(nw, dtype=jnp.float32)[:, None] * jnp.ones(
        (1, nd), dtype=jnp.float32
    )
    state = State(coords=coords)
    for _ in range(2 * (nw // 4)):  # 2 full rotations of the stride
        carry = mv.update_carry(carry, state, model)
    filled = int(carry["filled"])
    archived_ids = set(
        np.asarray(carry["z"][:filled, 0]).astype(int).tolist()
    )
    assert archived_ids == set(range(nw)), sorted(archived_ids)
