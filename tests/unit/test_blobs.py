"""Blob pytree tests (reference ``tests/unit/test_blobs.py``).

Dynamic dtype inference and object/ragged blobs are out of scope under jit
(SURVEY hard part (b)); static blob pytrees of any structure are supported.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emcee_tpu import EnsembleSampler


def _run(lp, nwalkers=16, ndim=2, nsteps=8, seed=0):
    coords = np.asarray(
        jax.random.normal(jax.random.key(seed), (nwalkers, ndim))
    )
    s = EnsembleSampler(nwalkers, ndim, lp, seed=seed)
    s.run_mcmc(coords, nsteps)
    return s


def test_vector_blob():
    def lp(x):
        return -0.5 * jnp.sum(x**2), x

    s = _run(lp)
    blobs = s.get_blobs()
    assert np.shape(blobs) == (8, 16, 2)


def test_scalar_blob():
    def lp(x):
        return -0.5 * jnp.sum(x**2), jnp.sum(x)

    s = _run(lp)
    blobs = s.get_blobs()
    assert np.shape(blobs) == (8, 16)


def test_multiple_blobs_tuple():
    def lp(x):
        return -0.5 * jnp.sum(x**2), jnp.sum(x), x * 2.0

    s = _run(lp)
    blobs = s.get_blobs()
    assert isinstance(blobs, tuple) and len(blobs) == 2
    assert np.shape(blobs[0]) == (8, 16)
    assert np.shape(blobs[1]) == (8, 16, 2)


def test_dict_blob():
    def lp(x):
        return -0.5 * jnp.sum(x**2), {"s": jnp.sum(x), "v": x}

    s = _run(lp)
    blobs = s.get_blobs()
    assert set(blobs.keys()) == {"s", "v"}
    assert np.shape(blobs["s"]) == (8, 16)
    assert np.shape(blobs["v"]) == (8, 16, 2)


def test_int_dtype_blob():
    def lp(x):
        return -0.5 * jnp.sum(x**2), jnp.argmax(jnp.abs(x)).astype(jnp.int32)

    s = _run(lp)
    blobs = s.get_blobs()
    assert np.shape(blobs) == (8, 16)
    assert blobs.dtype == np.int32


def test_matrix_blob():
    def lp(x):
        return -0.5 * jnp.sum(x**2), jnp.outer(x, x)

    s = _run(lp)
    blobs = s.get_blobs()
    assert np.shape(blobs) == (8, 16, 2, 2)


def test_blobs_accepted_consistency():
    """Blobs of rejected proposals must carry the previous value."""

    def lp(x):
        return -0.5 * jnp.sum(x**2), x

    s = _run(lp, nsteps=20)
    chain = np.asarray(s.get_chain())
    blobs = np.asarray(s.get_blobs())
    np.testing.assert_allclose(blobs, chain, rtol=1e-6)


def test_hdf_dict_blob_key_change_rejected(tmp_path):
    """Writing dict blobs with different keys into an existing store must
    raise: count-only validation would pack values into the wrong
    (sorted-name-ordered) fields."""
    from emcee_tpu.backends import HDFBackend

    b = HDFBackend(str(tmp_path / "blobs.h5"))
    b.reset(4, 2)
    coords = np.zeros((3, 4, 2))
    lp = np.zeros((3, 4))
    acc = np.zeros((3, 4), np.int32)
    ok = {"a": np.zeros((3, 4), np.float32), "b": np.ones((3, 4), np.float32)}
    b.save_chunk(coords, lp, ok, acc, None)
    bad = {"b": np.zeros((2, 4), np.float32), "c": np.ones((2, 4), np.float32)}
    with pytest.raises(ValueError, match="field names changed"):
        b.save_chunk(coords[:2], lp[:2], bad, acc[:2], None)


def test_blobless_resume_of_blobful_chain_rejected(tmp_path):
    """A model that stopped returning blobs cannot continue a blob-ful
    chain: the accept select would freeze the stale blob values into
    every stored row (silent corruption, not an error)."""
    from emcee_tpu.backends import HDFBackend

    path = str(tmp_path / "stale.h5")

    def lp_b(x):
        return -0.5 * jnp.sum(x**2), jnp.sum(x)

    coords = np.asarray(jax.random.normal(jax.random.key(1), (8, 2)))
    s1 = EnsembleSampler(8, 2, lp_b, backend=HDFBackend(path), seed=0)
    s1.run_mcmc(coords, 4)

    def lp_nb(x):
        return -0.5 * jnp.sum(x**2)

    s2 = EnsembleSampler(8, 2, lp_nb, backend=HDFBackend(path), seed=0)
    with pytest.raises(ValueError, match="inconsistent use of blobs"):
        s2.run_mcmc(None, 3)


def test_hdf_blob_kind_change_rejected(tmp_path):
    """A dict-layout blob file continued with a same-arity tuple (or
    vice versa) must raise: dict leaves are sorted-key ordered, tuple
    leaves positional — crossing kinds silently swaps fields."""
    from emcee_tpu.backends import HDFBackend

    b = HDFBackend(str(tmp_path / "kind.h5"))
    b.reset(4, 2)
    coords = np.zeros((2, 4, 2))
    lp = np.zeros((2, 4))
    acc = np.zeros((2, 4), np.int32)
    ok = {"zz": np.zeros((2, 4), np.float32), "aa": np.ones((2, 4), np.float32)}
    b.save_chunk(coords, lp, ok, acc, None)
    bad = (np.zeros((2, 4), np.float32), np.ones((2, 4), np.float32))
    with pytest.raises(ValueError, match="kind"):
        b.save_chunk(coords, lp, bad, acc, None)
