"""PTSampler driver-surface parity with EnsembleSampler and storage
scaling guarantees.

Round-4 coverage: the tempered driver offers the same surface the flat
driver does (progress bars, named parameters, host-callback likelihoods
with pools, blocked mixtures — reference anchor
``/root/reference/src/emcee/ensemble.py:399-419, 174-214``) and its
storage path does zero full-chain copies on a pre-grown run while the
``sample()`` generator stays O(n).
"""

import pickle
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emcee_tpu import moves
from emcee_tpu.backends.pt import PTBackend, PTHDFBackend
from emcee_tpu.parallel.tempering import PTSampler


def log_like(x):
    return -0.5 * jnp.sum(x**2)


def log_prior(x):
    return jnp.where(jnp.all(jnp.abs(x) < 20.0), 0.0, -jnp.inf)


def init_coords(T=4, nw=16, nd=2, seed=1):
    return np.random.default_rng(seed).normal(size=(T, nw, nd))


class CountingPTBackend(PTBackend):
    def __init__(self):
        super().__init__()
        self.grow_allocations = 0

    def grow(self, ngrow, blobs=None):
        before = self.chain
        super().grow(ngrow, blobs)
        if self.chain is not before:
            self.grow_allocations += 1


def test_run_mcmc_pregrows_once():
    """A pre-grown run does exactly one chain allocation, regardless of
    how many chunks the scheduler issues."""
    backend = CountingPTBackend()
    pt = PTSampler(
        4, 16, 2, log_like, log_prior, backend=backend, seed=0,
        io_chunk_bytes=16 * 1024,  # force many small chunks
    )
    pt.run_mcmc(init_coords(), 64)
    assert backend.grow_allocations == 1
    assert backend.iteration == 64
    assert pt.get_chain().shape == (64, 4, 16, 2)


def test_sample_generator_zero_copies():
    """The storing generator pre-sizes once; the chain buffer is never
    reallocated across yields (the O(n^2) failure mode)."""
    backend = CountingPTBackend()
    pt = PTSampler(4, 16, 2, log_like, log_prior, backend=backend, seed=0)
    n = 0
    for state in pt.sample(init_coords(), iterations=32):
        n += 1
    assert n == 32
    assert backend.iteration == 32
    assert backend.grow_allocations == 1


def test_sample_matches_run_mcmc_bitwise():
    """One-step generator chunks and one big run_mcmc chunk produce the
    identical stored chain (the device stream is chunk-size invariant)."""
    coords = init_coords()
    b1, b2 = PTBackend(), PTBackend()
    pt1 = PTSampler(4, 16, 2, log_like, log_prior, backend=b1, seed=3)
    pt1.run_mcmc(coords, 12)
    pt2 = PTSampler(4, 16, 2, log_like, log_prior, backend=b2, seed=3)
    for _ in pt2.sample(coords, iterations=12):
        pass
    np.testing.assert_array_equal(pt1.get_chain(), pt2.get_chain())
    np.testing.assert_array_equal(
        b1.swaps_proposed, b2.swaps_proposed
    )
    np.testing.assert_array_equal(
        b1.swaps_accepted, b2.swaps_accepted
    )


@pytest.mark.parametrize("swap_every", [1, 2, 3])
def test_count_proposed_delta_matches_bruteforce(swap_every):
    pt = PTSampler(
        5, 10, 2, log_like, log_prior, swap_every=swap_every, seed=0
    )

    def brute(lo, hi):
        out = np.zeros(4, dtype=np.int64)
        for sidx in range(lo, hi):
            if sidx % swap_every == swap_every - 1:
                out[np.arange(sidx % 2, 4, 2)] += 10
        return out

    for lo, hi in [(0, 1), (0, 17), (5, 23), (7, 7), (100, 137)]:
        np.testing.assert_array_equal(
            pt._count_proposed_delta(lo, hi), brute(lo, hi)
        )


def test_pt_hdf_grow_presizes(tmp_path):
    backend = PTHDFBackend(str(tmp_path / "pt.h5"))
    pt = PTSampler(3, 8, 2, log_like, log_prior, backend=backend, seed=0)
    pt.run_mcmc(init_coords(3, 8, 2), 10)
    assert backend.iteration == 10
    assert pt.get_chain().shape == (10, 3, 8, 2)
    # Resume appends past the pre-grown region consistently.
    pt.run_mcmc(None, 5)
    assert backend.iteration == 15
    assert pt.get_chain().shape == (15, 3, 8, 2)


def test_pt_progress_smoke(capsys):
    pt = PTSampler(3, 8, 2, log_like, log_prior, seed=0)
    pt.run_mcmc(init_coords(3, 8, 2), 5, progress=True)
    for _ in pt.sample(None, iterations=2, progress=True):
        pass
    assert pt.backend.iteration == 7


def test_pt_parameter_names():
    def named_like(params):
        return -0.5 * (params["a"] ** 2 + jnp.sum(params["b"] ** 2))

    def named_prior(params):
        return jnp.where(jnp.abs(params["a"]) < 20.0, 0.0, -jnp.inf)

    pt = PTSampler(
        3, 8, 3, named_like, named_prior,
        parameter_names={"a": 0, "b": [1, 2]}, seed=0,
    )
    pt.run_mcmc(init_coords(3, 8, 3), 10)
    ll = pt.get_log_like()
    chain = pt.get_chain()
    np.testing.assert_allclose(
        ll, -0.5 * np.sum(chain**2, axis=-1), rtol=1e-5
    )


def np_like(x):
    return -0.5 * float(np.sum(np.asarray(x) ** 2))


def np_prior(x):
    return 0.0 if np.all(np.abs(np.asarray(x)) < 20.0) else -np.inf


def test_pt_host_callback_with_pool():
    coords = init_coords(3, 8, 2)
    pt_seq = PTSampler(
        3, 8, 2, np_like, np_prior, host_callback=True, seed=0
    )
    pt_seq.run_mcmc(coords, 6)
    with ThreadPoolExecutor(4) as ex:
        pt_par = PTSampler(
            3, 8, 2, np_like, np_prior, host_callback=True, pool=ex,
            seed=0,
        )
        pt_par.run_mcmc(coords, 6)
    np.testing.assert_array_equal(
        pt_seq.get_chain(), pt_par.get_chain()
    )


def test_pt_host_callback_rejects_gradient_moves():
    pt = PTSampler(
        3, 8, 2, np_like, np_prior, host_callback=True,
        moves=moves.MALAMove(0.5), seed=0,
    )
    with pytest.raises((ValueError, NotImplementedError, RuntimeError)):
        pt.run_mcmc(init_coords(3, 8, 2), 2)


def test_pt_mixture_block():
    """Blocked mixtures sample correctly and keep the swap machinery
    (parity, counters) continuous across blocks."""
    mix = [(moves.StretchMove(), 0.7), (moves.DEMove(), 0.3)]
    pt = PTSampler(
        4, 32, 2, log_like, log_prior, moves=mix, mixture_block=4,
        seed=0,
    )
    pt.run_mcmc(init_coords(4, 32, 2), 400)
    assert pt.get_chain().shape == (400, 4, 32, 2)
    assert np.all(pt.swaps_proposed > 0)
    np.testing.assert_array_equal(
        pt.swaps_proposed, pt._count_proposed_delta(0, 400)
    )
    cold = pt.get_chain(temp=0, discard=100, flat=True)
    assert np.all(np.abs(cold.mean(axis=0)) < 0.3)
    assert np.all(np.abs(cold.var(axis=0) - 1.0) < 0.35)


def test_pt_pickle_roundtrip_resumes():
    pt = PTSampler(3, 8, 2, log_like, log_prior, seed=0)
    pt.run_mcmc(init_coords(3, 8, 2), 5)
    clone = pickle.loads(pickle.dumps(pt))
    assert clone.pool is None
    clone.run_mcmc(None, 3)
    assert clone.backend.iteration == 8


# -- blobs on the tempered path ------------------------------------------


def log_like_blobs(x):
    ll = -0.5 * jnp.sum(x**2)
    return ll, 2.0 * ll, x  # scalar + vector blob


def test_pt_blobs_memory_backend():
    """Blobs ride the tempered chain: stored per rung, swapped with
    their walkers, and consistent with the chain row by row."""
    pt = PTSampler(3, 16, 2, log_like_blobs, log_prior, seed=0)
    pt.run_mcmc(init_coords(3, 16, 2), 30)
    ll = np.asarray(pt.get_log_like())
    scalar, vec = pt.get_blobs()
    chain = np.asarray(pt.get_chain())
    assert np.asarray(scalar).shape == (30, 3, 16)
    assert np.asarray(vec).shape == (30, 3, 16, 2)
    # blob_1 == 2 * log_like and blob_2 == coords for EVERY rung and
    # step — any swap that moved a walker without its blobs would break
    # this identity.
    np.testing.assert_allclose(np.asarray(scalar), 2.0 * ll, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(vec), chain, rtol=1e-5)
    # temp selection
    s0 = pt.get_blobs(temp=0)
    np.testing.assert_allclose(np.asarray(s0[0]), scalar[:, 0])
    # resume keeps the blob stream consistent
    pt.run_mcmc(None, 10)
    scalar2, _ = pt.get_blobs()
    np.testing.assert_allclose(
        np.asarray(scalar2), 2.0 * np.asarray(pt.get_log_like()),
        rtol=1e-5,
    )


def test_pt_blobs_device_backend():
    from emcee_tpu.backends.pt import PTDeviceBackend

    backend = PTDeviceBackend()
    pt = PTSampler(
        3, 16, 2, log_like_blobs, log_prior, backend=backend, seed=0
    )
    pt.run_mcmc(init_coords(3, 16, 2), 20)
    scalar, vec = pt.get_blobs()
    np.testing.assert_allclose(
        np.asarray(scalar), 2.0 * np.asarray(pt.get_log_like()),
        rtol=1e-5,
    )
    # drains into a host backend with blobs intact
    host = backend.to_host()
    h_scalar, h_vec = host.get_blobs()
    np.testing.assert_allclose(h_scalar, np.asarray(scalar), rtol=1e-6)
    last = backend.get_last_sample()
    assert last.blobs is not None


def test_pt_blobs_hdf_backend(tmp_path):
    backend = PTHDFBackend(str(tmp_path / "ptb.h5"))
    pt = PTSampler(
        3, 16, 2, log_like_blobs, log_prior, backend=backend, seed=0
    )
    pt.run_mcmc(init_coords(3, 16, 2), 15)
    # Pytree contract symmetric with the in-memory PT backends: a
    # tuple of leaves, not the on-disk record array.
    b0, b1 = pt.get_blobs()
    assert b0.shape == (15, 3, 16)
    np.testing.assert_allclose(
        b0, 2.0 * np.asarray(pt.get_log_like()), rtol=1e-5
    )
    np.testing.assert_allclose(
        b1, np.asarray(pt.get_chain()), rtol=1e-5
    )
    # structured=True exposes the raw on-disk record array.
    rec = backend.get_blobs(structured=True)
    assert rec.shape == (15, 3, 16)
    assert set(rec.dtype.names) == {"blob0", "blob1"}
    np.testing.assert_allclose(rec["blob0"], b0, rtol=1e-5)
    # temp= slices every leaf.
    t0, _ = backend.get_blobs(temp=0)
    np.testing.assert_allclose(t0, b0[:, 0], rtol=1e-5)
    # fresh sampler resumes from the file, recomputing blob structure
    pt2 = PTSampler(
        3, 16, 2, log_like_blobs, log_prior,
        backend=PTHDFBackend(str(tmp_path / "ptb.h5")), seed=0,
    )
    pt2.run_mcmc(None, 5)
    assert pt2.get_blobs()[0].shape == (20, 3, 16)


def test_pt_no_blobs_unchanged():
    pt = PTSampler(3, 8, 2, log_like, log_prior, seed=0)
    pt.run_mcmc(init_coords(3, 8, 2), 5)
    assert pt.get_blobs() is None
