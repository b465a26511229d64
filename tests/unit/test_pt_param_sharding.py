"""PTSampler parameter-axis sharding (tempering x long-ndim combo).

Coords shard over a (temp | walkers, params) mesh; the user log-like /
log-prior compute shard-local partial sums that the tempered model
psums BEFORE the beta algebra (a prior bound violated in any block must
mask globally).  Swap exchanges pair identical walker slots, so the
parameter shards swap their own blocks consistently with no extra
communication (accept uniforms are identical across param shards by
key construction).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from emcee_tpu import PTSampler, moves

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 devices"
)


def partial_log_like(x):
    return -0.5 * jnp.sum(x**2)


def partial_log_prior(x):
    # Partial: each block contributes its own bound check; the psum of
    # (-inf) partials masks the whole walker.
    return jnp.where(jnp.all(jnp.abs(x) < 30.0), 0.0, -jnp.inf)


def _mesh(wshards=2, pshards=4):
    devs = np.array(jax.devices()[: wshards * pshards]).reshape(
        wshards, pshards
    )
    return Mesh(devs, ("walkers", "params"))


def _run(move=None, ntemps=3, nwalkers=32, ndim=8, nsteps=600, seed=0):
    pt = PTSampler(
        ntemps,
        nwalkers,
        ndim,
        partial_log_like,
        partial_log_prior,
        moves=move,
        seed=seed,
        mesh=_mesh(),
        param_axis="params",
    )
    rng = np.random.default_rng(seed)
    p0 = rng.normal(size=(ntemps, nwalkers, ndim))
    pt.run_mcmc(p0, nsteps)
    return pt


def test_pt_param_sharded_statistics():
    pt = _run(nsteps=800)
    cold = np.asarray(pt.get_chain(temp=0, flat=True, discard=300))
    assert np.all(np.abs(cold.mean(0)) < 0.15)
    assert np.all(np.abs(cold.std(0) - 1) < 0.12)
    acc = np.asarray(pt.acceptance_fraction)
    assert np.all((acc > 0.05) & (acc < 0.95))
    # swaps actually happen
    assert np.asarray(pt.swaps_accepted).sum() > 0


def test_pt_param_sharded_log_like_is_global():
    pt = _run(nsteps=20)
    chain = np.asarray(pt.get_chain())
    ll = np.asarray(pt.get_log_like())
    np.testing.assert_allclose(
        ll, -0.5 * np.sum(chain**2, axis=-1), rtol=1e-4
    )


def test_pt_param_sharded_gradient_move():
    pt = _run(move=moves.MALAMove(0.8), nsteps=300)
    cold = np.asarray(pt.get_chain(temp=0, flat=True, discard=100))
    assert np.all(np.abs(cold.mean(0)) < 0.2)
    assert np.all(np.abs(cold.std(0) - 1) < 0.15)


def test_pt_param_axis_requires_mesh_and_divisibility():
    with pytest.raises(ValueError):
        PTSampler(
            3, 16, 4, partial_log_like, partial_log_prior,
            param_axis="params",
        )
    with pytest.raises(ValueError):
        PTSampler(
            3, 32, 7, partial_log_like, partial_log_prior,
            mesh=_mesh(), param_axis="params",
        )


def test_pt_param_blobs_rejected():
    def like_with_blobs(x):
        v = -0.5 * jnp.sum(x**2)
        return v, v

    pt = PTSampler(
        3, 32, 8, like_with_blobs, partial_log_prior,
        mesh=_mesh(), param_axis="params", seed=0,
    )
    p0 = np.random.default_rng(0).normal(size=(3, 32, 8))
    with pytest.raises(NotImplementedError, match="parameter-axis"):
        pt.run_mcmc(p0, 2)


def test_pt_param_sharded_matches_unsharded_exactly():
    """Matched-key equivalence under x64: with one walker shard, the
    param-sharded run differs from the dense run only by the psum's
    reduction order — chains agree to float64 reassociation noise.
    Subprocess so the global x64 flag cannot leak into other tests."""
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
from emcee_tpu import PTSampler


def partial_log_like(x):
    return -0.5 * jnp.sum(x**2)


def partial_log_prior(x):
    return jnp.where(jnp.all(jnp.abs(x) < 30.0), 0.0, -jnp.inf)


ntemps, nwalkers, ndim, nsteps = 3, 16, 8, 60
rng = np.random.default_rng(3)
p0 = rng.normal(size=(ntemps, nwalkers, ndim))

# 1 walker-shard x 8 param-shards
mesh_p = Mesh(np.array(jax.devices()[:8]).reshape(1, 8),
              ("walkers", "params"))
pt_p = PTSampler(ntemps, nwalkers, ndim, partial_log_like,
                 partial_log_prior, seed=11, mesh=mesh_p,
                 param_axis="params")
pt_p.run_mcmc(p0, nsteps)

# dense 1-shard run with the same mesh-folded key stream
mesh_1 = Mesh(np.array(jax.devices()[:1]).reshape(1,), ("walkers",))
pt_d = PTSampler(ntemps, nwalkers, ndim, partial_log_like,
                 partial_log_prior, seed=11, mesh=mesh_1)
pt_d.run_mcmc(p0, nsteps)

a = np.asarray(pt_p.get_chain())
b = np.asarray(pt_d.get_chain())
np.testing.assert_allclose(a, b, rtol=0, atol=1e-9)
np.testing.assert_array_equal(
    np.asarray(pt_p.backend.swaps_accepted),
    np.asarray(pt_d.backend.swaps_accepted),
)
print("PT-PARAM-EXACT OK")
"""
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=900,
        env={
            k: v
            for k, v in __import__("os").environ.items()
            if k != "XLA_FLAGS"
        },
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "PT-PARAM-EXACT OK" in proc.stdout
