"""Host-callback path: pooled fan-out and declared blobs.

The reference's one real parallelism mechanism for expensive black-box
Python likelihoods is ``pool.map`` over per-walker calls
(``/root/reference/src/emcee/ensemble.py:489-496``; the ``parallel.ipynb``
tutorial workload).  These tests pin the TPU-native equivalent: the
``host_callback=True`` escape hatch fans per-walker evaluations out over
a user pool on the host, with blobs declared statically via
``host_callback_blobs``.
"""

import multiprocessing
import pickle
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pytest

from emcee_tpu import EnsembleSampler


def np_log_prob(x):
    return -0.5 * float(np.sum(np.asarray(x) ** 2))


def np_log_prob_blobs(x):
    x = np.asarray(x)
    lp = -0.5 * float(np.sum(x**2))
    return lp, 2.0 * lp, x.astype(np.float32)  # scalar blob + vector blob


def run_chain(pool=None, nsteps=8, **kwargs):
    sampler = EnsembleSampler(
        16, 2, np_log_prob, host_callback=True, pool=pool, seed=0, **kwargs
    )
    coords = np.random.default_rng(0).normal(size=(16, 2))
    sampler.run_mcmc(coords, nsteps)
    return sampler


def test_pool_chain_matches_sequential():
    """pool.map preserves order, so the chain is bit-identical."""
    seq = run_chain(pool=None)
    with ThreadPoolExecutor(4) as ex:
        pooled = run_chain(pool=ex)
    np.testing.assert_array_equal(seq.get_chain(), pooled.get_chain())
    np.testing.assert_array_equal(
        seq.get_log_prob(), pooled.get_log_prob()
    )


def test_int_pool_spawns_thread_pool():
    seq = run_chain(pool=None)
    pooled = run_chain(pool=4)
    np.testing.assert_array_equal(seq.get_chain(), pooled.get_chain())


def test_multiprocessing_pool():
    """A process pool needs the mapped callable picklable end to end."""
    seq = run_chain(pool=None, nsteps=4)
    with multiprocessing.Pool(2) as p:
        pooled = run_chain(pool=p, nsteps=4)
    np.testing.assert_array_equal(seq.get_chain(), pooled.get_chain())


def test_host_callback_blobs():
    """Declared-structure blobs ride the callback; values match the
    stored chain row by row."""
    sampler = EnsembleSampler(
        16,
        2,
        np_log_prob_blobs,
        host_callback=True,
        host_callback_blobs=[np.float64, ((2,), np.float32)],
        seed=0,
    )
    coords = np.random.default_rng(0).normal(size=(16, 2))
    sampler.run_mcmc(coords, 8)
    chain = sampler.get_chain()  # (it, nw, nd)
    lp = sampler.get_log_prob()
    scalar_blob, vec_blob = sampler.get_blobs()
    assert scalar_blob.shape == (8, 16)
    assert vec_blob.shape == (8, 16, 2)
    assert vec_blob.dtype == np.float32
    np.testing.assert_allclose(scalar_blob, 2.0 * lp, rtol=1e-6)
    np.testing.assert_allclose(
        vec_blob, chain.astype(np.float32), rtol=1e-6
    )


def test_host_callback_blobs_pooled():
    with ThreadPoolExecutor(4) as ex:
        sampler = EnsembleSampler(
            16,
            2,
            np_log_prob_blobs,
            host_callback=True,
            host_callback_blobs=[np.float64, ((2,), np.float32)],
            pool=ex,
            seed=0,
        )
        coords = np.random.default_rng(0).normal(size=(16, 2))
        sampler.run_mcmc(coords, 6)
    scalar_blob, _ = sampler.get_blobs()
    np.testing.assert_allclose(
        scalar_blob, 2.0 * sampler.get_log_prob(), rtol=1e-6
    )


def test_host_callback_parameter_names():
    """parameter_names reaches the host function (the adapter used to be
    silently bypassed on the callback path)."""

    def named_lp(params):
        return -0.5 * float(params["a"] ** 2 + np.sum(params["b"] ** 2))

    sampler = EnsembleSampler(
        16,
        3,
        named_lp,
        host_callback=True,
        parameter_names={"a": 0, "b": [1, 2]},
        seed=0,
    )
    coords = np.random.default_rng(0).normal(size=(16, 3))
    sampler.run_mcmc(coords, 6)
    lp = sampler.get_log_prob()
    expected = -0.5 * np.sum(sampler.get_chain() ** 2, axis=-1)
    np.testing.assert_allclose(lp, expected, rtol=1e-5)


def test_pool_without_host_callback_warns_and_is_ignored():
    with pytest.warns(UserWarning, match="pool"):
        sampler = EnsembleSampler(
            16,
            2,
            lambda x: -0.5 * np.sum(x**2),
            pool=4,
            vectorize=True,
            seed=0,
        )
    assert sampler.pool is None


def test_blob_spec_without_host_callback_raises():
    with pytest.raises(ValueError, match="host_callback"):
        EnsembleSampler(
            16,
            2,
            np_log_prob_blobs,
            host_callback_blobs=[np.float64],
            seed=0,
        )


def test_pickle_drops_pool():
    with ThreadPoolExecutor(2) as ex:
        sampler = run_chain(pool=ex, nsteps=4)
        clone = pickle.loads(pickle.dumps(sampler))
    assert clone.pool is None
    # The clone keeps sampling (sequentially) from where it left off.
    clone.run_mcmc(None, 2)
    assert clone.get_chain().shape[0] == 6


def test_pool_speedup_on_sleeping_likelihood():
    """The parallel.ipynb workload: a likelihood dominated by per-call
    latency.  8 workers over 16 walkers must beat sequential by >=2x
    (ideal 8x; generous bound for CI noise)."""

    def slow_lp(x):
        time.sleep(0.004)
        return -0.5 * float(np.sum(np.asarray(x) ** 2))

    coords = np.random.default_rng(0).normal(size=(16, 2))

    def timed(pool):
        sampler = EnsembleSampler(
            16, 2, slow_lp, host_callback=True, pool=pool, seed=0
        )
        sampler.run_mcmc(coords, 10)  # warm up the 10-step chunk's jit
        t0 = time.perf_counter()
        sampler.run_mcmc(None, 10)
        return time.perf_counter() - t0

    t_seq = timed(None)
    with ThreadPoolExecutor(8) as ex:
        t_par = timed(ex)
    assert t_par < t_seq / 2.0, (t_seq, t_par)


def test_string_blobs_roundtrip(tmp_path):
    """The docs/blobs.md escape hatch: fixed-width byte blobs carry
    strings through the callback path, the HDF backend, and back."""
    from emcee_tpu.backends import HDFBackend
    from emcee_tpu.utils import decode_str_blobs, encode_str_blob

    def lp_with_label(x):
        x = np.asarray(x)
        lp = -0.5 * float(np.sum(x**2))
        label = "pos" if x[0] > 0 else "negative"
        return lp, encode_str_blob(label, 16)

    backend = HDFBackend(str(tmp_path / "labels.h5"))
    sampler = EnsembleSampler(
        16,
        2,
        lp_with_label,
        host_callback=True,
        host_callback_blobs=[((16,), np.uint8)],
        backend=backend,
        seed=0,
    )
    coords = np.random.default_rng(0).normal(size=(16, 2))
    sampler.run_mcmc(coords, 6)
    labels = decode_str_blobs(sampler.get_blobs())
    assert labels.shape == (6, 16)
    chain = np.asarray(sampler.get_chain())
    expected = np.where(chain[..., 0] > 0, "pos", "negative")
    np.testing.assert_array_equal(labels, expected)
    # And through a fresh read of the HDF file.
    reloaded = HDFBackend(str(tmp_path / "labels.h5"), read_only=True)
    labels2 = decode_str_blobs(np.asarray(reloaded.get_blobs()))
    np.testing.assert_array_equal(labels2, expected)


def test_blob_arity_mismatch_raises():
    """Returning fewer blobs than host_callback_blobs declares must
    error, not silently store uninitialized buffer memory."""

    def lp_one_blob(x):
        x = np.asarray(x)
        return -0.5 * float(np.sum(x**2)), np.float64(x[0])

    sampler = EnsembleSampler(
        8,
        2,
        lp_one_blob,
        host_callback=True,
        host_callback_blobs=[np.float64, ((3,), np.float32)],
        seed=0,
    )
    coords = np.random.default_rng(0).normal(size=(8, 2))
    with pytest.raises(Exception, match="declares 2"):
        sampler.run_mcmc(coords, 2)


def test_encode_str_blob_utf8_boundary():
    """Truncation never splits a multi-byte codepoint (a raw byte cut
    used to poison the whole decode with UnicodeDecodeError)."""
    from emcee_tpu.utils import decode_str_blobs, encode_str_blob

    enc = encode_str_blob("abé", 3)  # 'é' is 2 bytes; would split
    assert decode_str_blobs(enc[None])[0] == "ab"
    enc4 = encode_str_blob("abé", 4)  # fits whole
    assert decode_str_blobs(enc4[None])[0] == "abé"
    # errors= passthrough for salvaging legacy stores
    bad = np.array([97, 98, 195], dtype=np.uint8)
    out = decode_str_blobs(bad[None], errors="replace")[0]
    assert out.startswith("ab")


def test_int_pool_executor_released_on_gc():
    """An internally-owned thread pool (pool=<int>) must die with the
    wrapper, not accumulate idle threads across sampler constructions."""
    import gc
    import threading
    import time as _time

    from emcee_tpu.model import wrap_log_prob_fn

    def lp(x):
        return -0.5 * float(np.sum(np.asarray(x) ** 2))

    base = threading.active_count()
    fns = [
        wrap_log_prob_fn(lp, host_callback=True, pool=4) for _ in range(3)
    ]
    # Exercise the pools so the worker threads actually spawn.
    for f in fns:
        f(np.zeros((8, 2), np.float32))
    assert threading.active_count() > base
    del fns, f  # f: loop variable still pins the last wrapper
    gc.collect()
    for _ in range(50):  # shutdown(wait=False): threads exit async
        if threading.active_count() <= base:
            break
        _time.sleep(0.1)
    assert threading.active_count() <= base


def _lp_two_blobs(x):
    x = np.asarray(x)
    return (
        -0.5 * float(np.sum(x**2)),
        np.float32(x[0]),
        (x * 2).astype(np.float32),
    )


def test_auto_inferred_callback_blobs():
    """host_callback_blobs='auto' probes the function with the initial
    coordinates and matches the explicitly-declared run exactly."""
    lp = _lp_two_blobs  # module-level: the pickle round-trip needs it
    p0 = np.random.default_rng(1).normal(size=(16, 2)).astype(np.float32)
    auto = EnsembleSampler(
        16, 2, lp, host_callback=True, host_callback_blobs="auto", seed=0
    )
    auto.run_mcmc(p0, 6)
    decl = EnsembleSampler(
        16,
        2,
        lp,
        host_callback=True,
        host_callback_blobs=[np.float32, ((2,), np.float32)],
        seed=0,
    )
    decl.run_mcmc(p0, 6)
    np.testing.assert_array_equal(
        np.asarray(auto.get_chain()), np.asarray(decl.get_chain())
    )
    for a, d in zip(auto.get_blobs(), decl.get_blobs()):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(d))
    # the inferred spec is persisted: a pickled clone skips the probe
    import pickle

    clone = pickle.loads(pickle.dumps(auto))
    clone.run_mcmc(None, 3)
    assert clone.backend.iteration == 9


def test_auto_infer_no_blobs():
    """'auto' with a plain scalar-returning function degrades to the
    no-blob path."""

    def lp(x):
        return -0.5 * float(np.sum(np.asarray(x) ** 2))

    p0 = np.random.default_rng(0).normal(size=(8, 2)).astype(np.float32)
    s = EnsembleSampler(
        8, 2, lp, host_callback=True, host_callback_blobs="auto", seed=0
    )
    s.run_mcmc(p0, 4)
    assert s.get_blobs() is None


def test_pt_auto_inferred_callback_blobs():
    """PTSampler supports host_callback_blobs (incl. 'auto'): blobs ride
    the likelihood through the tempered machinery."""
    import emcee_tpu

    def ll(x):
        x = np.asarray(x)
        return -0.5 * float(np.sum(x**2)), np.float32(np.sum(x**2))

    def lpr(x):
        return 0.0

    import jax

    c0 = np.asarray(
        jax.random.normal(jax.random.key(2), (3, 8, 2)), dtype=np.float32
    )
    pt = emcee_tpu.PTSampler(
        3, 8, 2, ll, lpr, seed=4, host_callback=True,
        host_callback_blobs="auto",
    )
    pt.run_mcmc(c0, 5)
    assert np.shape(pt.get_blobs()) == (5, 3, 8)
    with pytest.raises(ValueError, match="requires host_callback"):
        emcee_tpu.PTSampler(
            3, 8, 2, ll, lpr, host_callback_blobs=[np.float32]
        )


def _named_lp(params):
    return -0.5 * float(params["a"] ** 2 + np.sum(params["bc"] ** 2))


def test_named_params_with_process_pool():
    """parameter_names survives a real multiprocessing.Pool: the
    adapter must be picklable (a class, not a local closure)."""
    p0 = np.random.default_rng(0).normal(size=(8, 3)).astype(np.float32)
    with multiprocessing.Pool(2) as pool:
        s = EnsembleSampler(
            8,
            3,
            _named_lp,
            host_callback=True,
            pool=pool,
            parameter_names={"a": 0, "bc": [1, 2]},
            seed=0,
        )
        s.run_mcmc(p0, 4)
    assert np.asarray(s.get_chain()).shape == (4, 8, 3)


def test_sample_positional_args_unshifted():
    """The deprecated thin= rides at the END of the signatures: v0.5.0
    positional calls (thin_by, store, ...) must bind unchanged."""

    def lp(x):
        return -0.5 * np.sum(np.asarray(x) ** 2)

    import emcee_tpu
    import inspect

    for fn, after in [
        (EnsembleSampler.sample, "progress_kwargs"),
        (emcee_tpu.PTSampler.run_mcmc, "progress_kwargs"),
        (emcee_tpu.PTSampler.sample, "progress_kwargs"),
    ]:
        params = list(inspect.signature(fn).parameters)
        assert params.index("thin") > params.index(after), params
