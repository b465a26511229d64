"""Object/dynamic blobs and the untraceable-log-prob host fallback.

Mirrors the reference's dynamic-blob coverage
(``/root/reference/src/emcee/tests/unit/test_blobs.py:21-96``): the
reference supports string/object/ragged blobs because everything runs on
the host; here the host-callback path stores blob values in a host-side
table and threads int32 handles through the jitted chain
(``emcee_tpu/hostblobs.py``).
"""

import pickle
import warnings

import jax
import numpy as np
import pytest

from emcee_tpu import EnsembleSampler, backends
from emcee_tpu.hostblobs import HostBlobStore


class BlobLogProb:
    def __init__(self, blob_function):
        self.blob_function = blob_function

    def __call__(self, params):
        return -0.5 * np.sum(params**2), self.blob_function(params)


@pytest.mark.parametrize(
    "blob_shape,dtype_is_object,func",
    [
        ((), True, lambda x: "face"),
        ((), True, lambda x: object()),
        ((2,), True, lambda x: ("face", "surface")),
        ((2,), True, lambda x: (np.random.randn(5), "face")),
    ],
)
def test_object_blob_shapes(blob_shape, dtype_is_object, func):
    """The reference's non-HDF blob cases: object arrays of the right
    shape come back through get_blobs()."""
    np.random.seed(42)
    coords = np.random.randn(32, 3)
    model = BlobLogProb(func)
    sampler = EnsembleSampler(32, 3, model)
    assert sampler._evaluation_mode == "host-fallback"
    sampler.run_mcmc(coords, 10)
    blobs = sampler.get_blobs()
    assert blobs.shape == (10, 32) + blob_shape
    assert blobs.dtype == np.dtype("object")


def test_ragged_numeric_blobs_fall_back_to_object():
    def lp(p):
        v = float(np.sum(-0.5 * p**2))  # float() cast: untraceable
        return v, 1.0, np.random.randn(3)

    np.random.seed(1)
    coords = np.random.randn(16, 2)
    s = EnsembleSampler(16, 2, lp)
    s.run_mcmc(coords, 8)
    b = s.get_blobs()
    assert b.shape == (8, 16, 2) and b.dtype == np.dtype("object")
    # each cell holds the raw per-walker value
    assert np.shape(b[0, 0, 1]) == (3,)


def test_numeric_blobs_under_fallback_stack_like_reference():
    def lp(p):
        v = float(np.sum(-0.5 * p**2))
        return v, 0.1, 5

    np.random.seed(2)
    coords = np.random.randn(16, 2)
    s = EnsembleSampler(16, 2, lp)
    assert s._evaluation_mode == "host-fallback"
    s.run_mcmc(coords, 6)
    b = s.get_blobs()
    assert b.shape == (6, 16, 2) and b.dtype.kind == "f"
    np.testing.assert_allclose(b[:, :, 0], 0.1)
    np.testing.assert_allclose(b[:, :, 1], 5.0)


def test_fallback_chain_matches_shapes_and_resume():
    def lp(p):
        if np.any(np.abs(p) > 1e6):  # data-dependent branch
            return -np.inf
        return -0.5 * np.sum(p**2)

    np.random.seed(3)
    coords = np.random.randn(12, 2)
    s = EnsembleSampler(12, 2, lp)
    assert s._evaluation_mode == "host-fallback"
    s.run_mcmc(coords, 10)
    assert s.get_chain().shape == (10, 12, 2)
    assert s.get_blobs() is None
    final = s.run_mcmc(None, 5)
    assert s.get_chain().shape == (15, 12, 2)
    assert final.coords.shape == (12, 2)


def test_traceable_functions_stay_traced():
    import jax.numpy as jnp

    s = EnsembleSampler(8, 2, lambda x: -0.5 * jnp.sum(x**2))
    assert s._evaluation_mode == "traced"


def test_fallback_exposed_states_carry_values_not_handles():
    model = BlobLogProb(lambda x: "word")
    np.random.seed(4)
    coords = np.random.randn(16, 2)
    s = EnsembleSampler(16, 2, model)
    outs = []
    for st in s.sample(coords, iterations=3):
        outs.append(st.blobs)
    assert all(o.dtype == np.dtype("object") for o in outs)
    assert outs[-1][0] == "word"
    last = s.get_last_sample()
    assert last.blobs.dtype == np.dtype("object")


def _rand_blob(x):
    return float(np.random.rand())


def test_fallback_pickle_reseeds_store():
    model = BlobLogProb(_rand_blob)
    np.random.seed(5)
    coords = np.random.randn(16, 2)
    s = EnsembleSampler(16, 2, model)
    s.run_mcmc(coords, 4)
    s2 = pickle.loads(pickle.dumps(s))
    # the host table died with the process image; resume re-evaluates
    s2.run_mcmc(None, 3)
    assert s2.get_chain().shape == (7, 16, 2)
    assert s2.get_blobs().shape == (7, 16)


def test_object_blobs_rejected_on_device_backend():
    model = BlobLogProb(lambda x: "s")
    np.random.seed(6)
    coords = np.random.randn(16, 2)
    s = EnsembleSampler(16, 2, model, backend=backends.DeviceBackend())
    with pytest.raises(ValueError, match="DeviceBackend"):
        s.run_mcmc(coords, 2)


def test_explicit_object_mode_via_host_callback_auto():
    """host_callback=True + blobs='auto' adopts the object store for
    non-numeric blobs instead of erroring (round-4 'auto' only handled
    numerics)."""
    model = BlobLogProb(lambda x: ("a", 1.0))
    np.random.seed(7)
    coords = np.random.randn(16, 2)
    s = EnsembleSampler(
        16, 2, model, host_callback=True, host_callback_blobs="auto"
    )
    s.run_mcmc(coords, 3)
    b = s.get_blobs()
    assert b.shape == (3, 16, 2) and b.dtype == np.dtype("object")


def _untraceable_with_blob(p):
    v = float(np.sum(-0.5 * p**2))  # float() cast: untraceable
    return v, "tag"


def test_store_prunes_between_chunks():
    np.random.seed(8)
    coords = np.random.randn(16, 2)
    s = EnsembleSampler(16, 2, _untraceable_with_blob)
    assert s._evaluation_mode == "host-fallback"
    s.run_mcmc(coords, 20)
    store = s._blob_store()
    # live ensemble only: one row of handles (+ nothing older)
    assert len(store) <= 2 * 16


def test_store_prunes_with_store_false():
    np.random.seed(9)
    coords = np.random.randn(16, 2)
    s = EnsembleSampler(16, 2, _untraceable_with_blob)
    s.run_mcmc(coords, 20, store=False)
    assert len(s._blob_store()) <= 2 * 16


def test_blob_store_reference_semantics_unit():
    store = HostBlobStore()
    ids = store.alloc([(1.0,), (2.0,)])
    arr = store.resolve(ids)
    assert arr.shape == (2,) and arr.dtype.kind == "f"
    ids2 = store.alloc([("x",), ("y",)])
    arr2 = store.resolve(ids2)
    assert arr2.dtype == np.dtype("object")
    # squeeze matches the reference: (1,5,1) -> (5,)
    v = np.zeros((1, 5, 1))
    ids3 = store.alloc([(v,), (v,)])
    assert store.resolve(ids3).shape == (2, 5)
    # declared structured dtype packs records
    ids4 = store.alloc([(0.5, 3), (0.25, 4)])
    rec = store.resolve(ids4, [("log_prior", float), ("mean", int)])
    assert rec.dtype.names == ("log_prior", "mean")
    np.testing.assert_allclose(rec["log_prior"], [0.5, 0.25])
    # inconsistent shapes across steps raise
    ida = store.alloc([(np.zeros(3),)] * 2)
    idb = store.alloc([(np.zeros(4),)] * 2)
    with pytest.raises(ValueError, match="inconsistent"):
        store.resolve(np.stack([ida, idb]))


def test_variable_blob_shape_raises_mid_run():
    """Reference ``test_blob_mismatch``: growing blob shapes raise a
    ValueError instead of silently storing stale-trace output."""

    class VariableLogProb:
        def __init__(self):
            self.i = 3

        def __call__(self, *args):
            return 0, np.zeros(self.i)

    np.random.seed(42)
    model = VariableLogProb()
    coords = np.random.randn(32, 3)
    sampler = EnsembleSampler(32, 3, model)
    model.i += 1
    sampler.run_mcmc(coords, 1)
    model.i += 1
    with pytest.raises(ValueError):
        sampler.run_mcmc(coords, 1)


def test_generator_store_false_prunes():
    np.random.seed(10)
    coords = np.random.randn(16, 2)
    s = EnsembleSampler(16, 2, _untraceable_with_blob)
    for st in s.sample(coords, iterations=12, store=False):
        pass
    assert len(s._blob_store()) <= 2 * 16


def test_object_blobs_interrupt_resume_consistent():
    """Interrupt mid-run in object-blob mode: completed chunks reach
    the backend with their RESOLVED blob values; resume recomputes the
    in-flight chunk (fresh handles) and the full chain + blobs match an
    uninterrupted run."""

    def lp(p):
        v = float(np.sum(-0.5 * p**2))  # untraceable
        return v, "s" if v > -3.0 else "t", round(v, 3)

    np.random.seed(11)
    coords = np.random.randn(16, 2)

    def build():
        return EnsembleSampler(
            16, 2, lp, seed=7, max_chunk_steps=5
        )

    # Straight run.
    ref = build()
    ref.run_mcmc(coords, 20)
    ref_chain = ref.get_chain()
    ref_blobs = ref.get_blobs()

    # Interrupted at the third chunk, then resumed.
    s = build()
    orig = s._get_run_chunk
    calls = {"n": 0}

    def interrupting(*a, **k):
        calls["n"] += 1
        if calls["n"] == 3:
            raise KeyboardInterrupt
        return orig(*a, **k)

    s._get_run_chunk = interrupting
    with pytest.raises(KeyboardInterrupt):
        s.run_mcmc(coords, 20)
    saved = s.backend.iteration
    assert 0 < saved < 20
    s._get_run_chunk = orig
    s.run_mcmc(None, 20 - saved)

    np.testing.assert_array_equal(s.get_chain(), ref_chain)
    got = s.get_blobs()
    assert got.shape == ref_blobs.shape == (20, 16, 2)
    assert (got == ref_blobs).all()
