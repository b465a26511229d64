"""Temperature-axis sharding tests (ppermute boundary swaps over the mesh).

The ladder splits across mesh shards: shard-internal swaps are local, and
the pair straddling each shard boundary exchanges rung data with the
neighbor via ``jax.lax.ppermute``.  The bimodal mode-hopping oracle is the
end-to-end check: walkers can only cross modes if swaps genuinely carry
states down the (distributed) ladder.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from emcee_tpu.parallel.tempering import PTSampler

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 devices"
)


def log_like(x):
    a = -0.5 * jnp.sum((x - 5.0) ** 2)
    b = -0.5 * jnp.sum((x + 5.0) ** 2)
    return jnp.logaddexp(a, b)


def log_prior(x):
    return jnp.where(jnp.all(jnp.abs(x) < 20.0), 0.0, -jnp.inf)


def make_mesh(tshards=2, wshards=4):
    devs = np.array(jax.devices()[: tshards * wshards]).reshape(
        tshards, wshards
    )
    return Mesh(devs, ("temp", "walkers"))


def test_temp_sharded_mode_hopping():
    T, nw, nd = 8, 32, 1
    pt = PTSampler(
        T,
        nw,
        nd,
        log_like,
        log_prior,
        seed=0,
        mesh=make_mesh(),
        temp_axis="temp",
    )
    coords = jax.random.uniform(
        jax.random.key(1), (T, nw, nd), minval=-10, maxval=10
    )
    pt.run_mcmc(coords, 1500)
    chain0 = pt.get_chain(temp=0, discard=400, flat=True)
    frac_pos = (chain0 > 0).mean()
    # Mode hopping requires swaps to traverse the shard boundary
    # (rung 3 <-> rung 4 lives across shards with 2 temp shards).
    assert abs(frac_pos - 0.5) < 0.12, frac_pos
    assert abs(np.abs(chain0).mean() - 5.0) < 0.25
    # Every rung pair (including the boundary pair, index 3) must have
    # accepted swaps.
    assert np.all(pt.swaps_accepted[: T - 1] > 0), pt.swaps_accepted


def test_temp_sharded_matches_dense_statistics():
    """Temperature-sharded == dense statistics, tight enough to catch a
    corrupted boundary ppermute swap: mode-occupation balance, location
    of the modes, and dispersion must all agree within MC noise."""
    T, nw, nd = 4, 64, 1
    coords = jax.random.uniform(
        jax.random.key(2), (T, nw, nd), minval=-10, maxval=10
    )

    dense = PTSampler(T, nw, nd, log_like, log_prior, seed=0)
    dense.run_mcmc(coords, 2000)
    d0 = dense.get_chain(temp=0, discard=500, flat=True)

    sharded = PTSampler(
        T,
        nw,
        nd,
        log_like,
        log_prior,
        seed=0,
        mesh=make_mesh(tshards=2, wshards=4),
        temp_axis="temp",
    )
    sharded.run_mcmc(coords, 2000)
    s0 = sharded.get_chain(temp=0, discard=500, flat=True)

    # Both cold chains sit on the +/-5 modes with balanced occupation.
    for c in (d0, s0):
        assert abs((c > 0).mean() - 0.5) < 0.1, (c > 0).mean()
    assert abs(np.abs(d0).mean() - np.abs(s0).mean()) < 0.1, (
        np.abs(d0).mean(),
        np.abs(s0).mean(),
    )
    assert abs(d0.std() - s0.std()) < 0.15, (d0.std(), s0.std())


def test_temp_sharded_validation():
    with pytest.raises(ValueError):
        PTSampler(
            8, 32, 1, log_like, log_prior, seed=0, temp_axis="temp"
        )  # no mesh
    with pytest.raises(ValueError):
        PTSampler(
            6,  # 6 rungs over 2 shards -> 3 per shard (odd) must raise
            32,
            1,
            log_like,
            log_prior,
            seed=0,
            mesh=make_mesh(),
            temp_axis="temp",
        )


def test_temp_sharded_resume():
    T, nw, nd = 8, 32, 1
    mesh = make_mesh()
    pt = PTSampler(
        T, nw, nd, log_like, log_prior, seed=0, mesh=mesh,
        temp_axis="temp",
    )
    coords = jax.random.normal(jax.random.key(0), (T, nw, nd))
    pt.run_mcmc(coords, 20, skip_initial_state_check=True)
    pt.run_mcmc(None, 20)
    assert pt.get_chain().shape == (40, T, nw, nd)
    assert np.all(np.isfinite(pt.get_chain()))


def test_temp_sharded_device_backend_matches_host():
    """PTDeviceBackend under a temp x walker mesh: the device-resident
    chain must match the host store bit-for-bit at the same seed."""
    from emcee_tpu.backends.pt import PTBackend, PTDeviceBackend

    T, nw, nd = 8, 32, 1
    coords = np.asarray(jax.random.normal(jax.random.key(0), (T, nw, nd)))
    chains = []
    for be in (PTBackend(), PTDeviceBackend()):
        pt = PTSampler(
            T, nw, nd, log_like, log_prior, seed=0, mesh=make_mesh(),
            temp_axis="temp", backend=be,
        )
        pt.run_mcmc(coords, 15, skip_initial_state_check=True)
        chains.append(np.asarray(pt.get_chain(), dtype=np.float64))
    np.testing.assert_array_equal(chains[0], chains[1])


def test_temp_sharded_blobs_swap_with_walkers():
    """Blobs under 2-D temp x walker sharding: the boundary-pair
    ppermute must carry blob leaves with the rung rows, so the
    blob == f(chain) identity holds at every rung and step."""

    def log_like_b(x):
        ll = -0.5 * jnp.sum(x**2)
        return ll, 2.0 * ll, x

    T, nw, nd = 4, 16, 2
    pt = PTSampler(
        T, nw, nd, log_like_b, log_prior,
        mesh=make_mesh(2, 4), temp_axis="temp", seed=0,
    )
    coords = np.random.default_rng(0).normal(size=(T, nw, nd))
    pt.run_mcmc(coords, 25)
    scalar, vec = pt.get_blobs()
    ll = np.asarray(pt.get_log_like())
    chain = np.asarray(pt.get_chain())
    np.testing.assert_allclose(np.asarray(scalar), 2.0 * ll, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(vec), chain, rtol=1e-5)
    # Swaps must actually be happening for this to test anything.
    assert np.asarray(pt.swaps_accepted).sum() > 0
