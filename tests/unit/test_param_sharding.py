"""Parameter-axis sharding tests (BASELINE.json workload 5 coverage).

Long-ndim mode: coords shard over a 2-D (walkers, params) mesh, the user
log-prob computes shard-local partial sums, and the framework completes
them with a psum over the parameter axis.  Red-blue proposals keep
per-walker randomness identical across parameter shards so every shard
proposes/accepts consistently without extra communication.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from emcee_tpu import EnsembleSampler, moves

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 devices"
)


def partial_normal_log_prob(x):
    # Shard-local partial sum over the local parameter block.
    return -0.5 * jnp.sum(x**2, axis=-1)


def make_mesh(wshards=2, pshards=4):
    devs = np.array(jax.devices()[: wshards * pshards]).reshape(
        wshards, pshards
    )
    return Mesh(devs, ("walkers", "params"))


def _run(move, nwalkers=64, ndim=8, nsteps=800, seed=0):
    mesh = make_mesh()
    sampler = EnsembleSampler(
        nwalkers,
        ndim,
        partial_normal_log_prob,
        moves=move,
        vectorize=True,
        seed=seed,
        mesh=mesh,
        param_axis="params",
    )
    coords = np.asarray(
        jax.random.normal(jax.random.key(seed), (nwalkers, ndim))
    )
    sampler.run_mcmc(coords, nsteps)
    return sampler


@pytest.mark.parametrize(
    "move",
    [
        moves.StretchMove(),
        moves.StretchMove(randomize_split=False),
        moves.StretchMove(randomize_split=False, pair_mode="roll"),
        moves.DEMove(),
        moves.DEMove(randomize_split=False, pair_mode="roll"),
        moves.DESnookerMove(),
        moves.GaussianMove(0.5),
        moves.SideMove(),
        moves.MALAMove(1.2),
        moves.HMCMove(0.8, n_leapfrog=5, jitter=0.2),
        moves.ChEESHMCMove(0.8, trajectory_length=2.0),
    ],
    ids=[
        "stretch",
        "stretch-blocked",
        "stretch-roll",
        "de",
        "de-roll",
        "snooker",
        "gaussian",
        "side",
        "mala",
        "hmc",
        "chees",
    ],
)
def test_param_sharded_statistics(move):
    sampler = _run(move, nsteps=1200)
    chain = np.asarray(sampler.get_chain(flat=True, discard=400))
    assert np.all(np.abs(chain.mean(0)) < 0.12)
    assert np.all(np.abs(chain.std(0) - 1) < 0.1)
    acc = sampler.acceptance_fraction
    assert np.all((acc > 0.05) & (acc < 0.95))


def test_param_sharded_log_prob_is_global():
    """Stored log_prob must be the full sum, not a shard partial."""
    sampler = _run(moves.StretchMove(), nsteps=20)
    chain = np.asarray(sampler.get_chain())
    lp = np.asarray(sampler.get_log_prob())
    np.testing.assert_allclose(
        lp, -0.5 * np.sum(chain**2, axis=-1), rtol=1e-4
    )


def test_param_sharded_unsupported_moves_raise():
    with pytest.raises(Exception):
        _run(moves.WalkMove(), nsteps=2)
    with pytest.raises(Exception):
        _run(moves.KDEMove(), nsteps=2)
    with pytest.raises(Exception):
        _run(moves.GaussianMove(0.5, mode="random"), nsteps=2)


def test_param_axis_requires_mesh():
    with pytest.raises(ValueError):
        EnsembleSampler(
            8, 2, partial_normal_log_prob, param_axis="params", seed=0
        )


def test_ndim_divisibility():
    mesh = make_mesh()
    with pytest.raises(ValueError):
        EnsembleSampler(
            64,
            7,
            partial_normal_log_prob,
            mesh=mesh,
            param_axis="params",
            seed=0,
        )


def test_param_sharded_matches_unsharded_exactly():
    """Matched-key equivalence: a (1 walker-shard x 8 param-shard) run must
    reproduce the same chain as a 1-shard run of the same mesh-folded key
    stream — the psum over parameter blocks is the only difference, so
    under float64 the chains agree to reduction-order noise.

    Runs in a subprocess with jax_enable_x64 so a knife-edge accept cannot
    flip on the psum's float reassociation (and so the global x64 flag
    cannot leak into other tests).
    """
    import subprocess
    import sys

    script = r"""
import os
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh
from emcee_tpu import EnsembleSampler, State, moves


def partial_lp(x):
    return -0.5 * jnp.sum(x**2, axis=-1)


nw, nd, nsteps = 32, 8, 200
coords = np.asarray(
    jax.random.normal(jax.random.key(0), (nw, nd), dtype=jnp.float64)
)
start = lambda: State(jnp.asarray(coords), random_state=jax.random.key(7))

# Comparator: 1-device walker mesh (same walker-axis key folding, full-dim
# log-prob in one block).
mesh_a = Mesh(np.array(jax.devices()[:1]), ("walkers",))
a = EnsembleSampler(nw, nd, partial_lp, vectorize=True, seed=0, mesh=mesh_a)
a.run_mcmc(start(), nsteps)

# Param-sharded: same single walker shard, 8 parameter shards + psum.
mesh_b = Mesh(np.array(jax.devices()[:8]).reshape(1, 8), ("walkers", "params"))
b = EnsembleSampler(
    nw, nd, partial_lp, vectorize=True, seed=0, mesh=mesh_b,
    param_axis="params",
)
b.run_mcmc(start(), nsteps)

ca, cb = np.asarray(a.get_chain()), np.asarray(b.get_chain())
np.testing.assert_allclose(cb, ca, rtol=1e-9, atol=1e-12)
np.testing.assert_array_equal(
    np.asarray(a.backend.accepted), np.asarray(b.backend.accepted)
)
print("OK")
"""
    import os

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    repo = os.path.join(os.path.dirname(__file__), "..", "..")
    out = subprocess.run(
        [sys.executable, "-c", script],
        env={**env, "PYTHONPATH": repo},
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "OK" in out.stdout


def test_param_sharded_mala_matches_unsharded_exactly():
    """Gradient-move matched-key equivalence: MALA's per-dim noise uses a
    topology-invariant stream (full-dim draw, local slice) and its
    factors psum over parameter shards, so a (1 x 8 param-shard) run
    reproduces the dense chain to reduction-order noise under x64.
    Exercises jax.grad through the psum-completed partial log-prob."""
    import os
    import subprocess
    import sys

    script = r"""
import os
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh
from emcee_tpu import EnsembleSampler, State, moves


def partial_lp(x):
    return -0.5 * jnp.sum(x**2, axis=-1)


nw, nd, nsteps = 32, 8, 150
coords = np.asarray(
    jax.random.normal(jax.random.key(0), (nw, nd), dtype=jnp.float64)
)
start = lambda: State(jnp.asarray(coords), random_state=jax.random.key(7))

mesh_a = Mesh(np.array(jax.devices()[:1]), ("walkers",))
a = EnsembleSampler(
    nw, nd, partial_lp, vectorize=True, seed=0, mesh=mesh_a,
    moves=moves.MALAMove(0.6),
)
a.run_mcmc(start(), nsteps)

mesh_b = Mesh(np.array(jax.devices()[:8]).reshape(1, 8), ("walkers", "params"))
b = EnsembleSampler(
    nw, nd, partial_lp, vectorize=True, seed=0, mesh=mesh_b,
    param_axis="params", moves=moves.MALAMove(0.6),
)
b.run_mcmc(start(), nsteps)

ca, cb = np.asarray(a.get_chain()), np.asarray(b.get_chain())
np.testing.assert_allclose(cb, ca, rtol=1e-9, atol=1e-12)
np.testing.assert_array_equal(
    np.asarray(a.backend.accepted), np.asarray(b.backend.accepted)
)
print("OK")
"""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    repo = os.path.join(os.path.dirname(__file__), "..", "..")
    out = subprocess.run(
        [sys.executable, "-c", script],
        env={**env, "PYTHONPATH": repo},
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "OK" in out.stdout
