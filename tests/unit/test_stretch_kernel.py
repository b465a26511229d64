"""Fused Pallas stretch-kernel tests (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emcee_tpu import EnsembleSampler, moves
from emcee_tpu.ops.stretch_kernel import fused_stretch_half_step


def log_prob(x):
    return -0.5 * jnp.sum(x**2, axis=-1)


def test_kernel_matches_reference_math():
    """Kernel output must equal the same half-step computed in plain jnp."""
    ng, nd = 16, 3
    k = jax.random.key(0)
    s = jax.random.normal(k, (ng, nd))
    c = jax.random.normal(jax.random.fold_in(k, 1), (ng, nd))
    lp_s = log_prob(s)
    u_z = jax.random.uniform(jax.random.fold_in(k, 2), (ng,))
    log_u = jnp.log(
        jax.random.uniform(jax.random.fold_in(k, 3), (ng,))
    )
    shift = 5
    a = 2.0

    out_c, out_lp, acc = fused_stretch_half_step(
        shift, s, c, lp_s, u_z, log_u, log_prob_fn=log_prob, a=a
    )

    zz = ((a - 1.0) * u_z + 1.0) ** 2 / a
    cr = jnp.roll(c, -shift, axis=0)
    q = cr - (cr - s) * zz[:, None]
    new_lp = log_prob(q)
    lnpdiff = (nd - 1.0) * jnp.log(zz) + new_lp - lp_s
    exp_acc = log_u < lnpdiff

    np.testing.assert_array_equal(np.asarray(acc), np.asarray(exp_acc))
    np.testing.assert_allclose(
        np.asarray(out_c),
        np.asarray(jnp.where(exp_acc[:, None], q, s)),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(out_lp),
        np.asarray(jnp.where(exp_acc, new_lp, lp_s)),
        rtol=1e-6,
    )


def test_pallas_engine_statistics():
    nw, nd = 64, 5
    p0 = np.random.default_rng(0).normal(size=(nw, nd))
    s = EnsembleSampler(
        nw,
        nd,
        log_prob,
        vectorize=True,
        seed=1,
        moves=moves.StretchMove(randomize_split=False, engine="pallas"),
    )
    s.run_mcmc(p0, 1500)
    c = s.get_chain(flat=True, discard=400)
    acc = s.acceptance_fraction
    assert np.all((acc > 0.1) & (acc < 0.9))
    assert np.all(np.abs(c.mean(0)) < 0.08)
    assert np.all(np.abs(c.std(0) - 1) < 0.06)


def test_pallas_engine_falls_back_with_blobs():
    """Blobbed log-probs silently use the generic XLA path."""

    def lp_blobs(x):
        return -0.5 * jnp.sum(x**2, axis=-1), x

    nw, nd = 32, 2
    p0 = np.random.default_rng(0).normal(size=(nw, nd))
    s = EnsembleSampler(
        nw,
        nd,
        lp_blobs,
        vectorize=True,
        seed=1,
        moves=moves.StretchMove(engine="pallas"),
    )
    s.run_mcmc(p0, 20)
    assert np.shape(s.get_blobs()) == (20, nw, nd)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
def test_pallas_engine_sharded():
    from emcee_tpu.parallel import walker_mesh

    nw, nd = 64, 3
    mesh = walker_mesh()
    p0 = np.random.default_rng(0).normal(size=(nw, nd))
    s = EnsembleSampler(
        nw,
        nd,
        log_prob,
        vectorize=True,
        seed=1,
        mesh=mesh,
        moves=moves.StretchMove(randomize_split=False, engine="pallas"),
    )
    s.run_mcmc(p0, 100)
    assert np.all(np.isfinite(s.get_chain()))


def test_de_pallas_engine_statistics():
    nw, nd = 64, 5
    p0 = np.random.default_rng(0).normal(size=(nw, nd))
    s = EnsembleSampler(
        nw,
        nd,
        log_prob,
        vectorize=True,
        seed=1,
        moves=moves.DEMove(randomize_split=False, engine="pallas"),
    )
    s.run_mcmc(p0, 2000)
    c = s.get_chain(flat=True, discard=600)
    acc = s.acceptance_fraction
    assert np.all((acc > 0.05) & (acc < 0.95))
    assert np.all(np.abs(c.mean(0)) < 0.1)
    assert np.all(np.abs(c.std(0) - 1) < 0.08)


def test_de_kernel_matches_reference_math():
    from emcee_tpu.ops.de_kernel import fused_de_half_step

    ng, nd = 16, 3
    k = jax.random.key(0)
    s = jax.random.normal(k, (ng, nd))
    c = jax.random.normal(jax.random.fold_in(k, 1), (ng, nd))
    lp_s = log_prob(s)
    z = jax.random.normal(jax.random.fold_in(k, 2), (ng,))
    log_u = jnp.log(jax.random.uniform(jax.random.fold_in(k, 3), (ng,)))
    s1, s2, g0, sigma = 3, 7, 0.8, 1e-5

    out_c, out_lp, acc = fused_de_half_step(
        s1, s2, s, c, lp_s, z, log_u,
        log_prob_fn=log_prob, g0=g0, sigma=sigma,
    )

    diffs = jnp.roll(c, -s2, axis=0) - jnp.roll(c, -s1, axis=0)
    gamma = g0 * (1.0 + sigma * z)
    q = s + gamma[:, None] * diffs
    new_lp = log_prob(q)
    exp_acc = log_u < (new_lp - lp_s)
    np.testing.assert_array_equal(np.asarray(acc), np.asarray(exp_acc))
    np.testing.assert_allclose(
        np.asarray(out_c),
        np.asarray(jnp.where(exp_acc[:, None], q, s)),
        rtol=1e-6,
    )
