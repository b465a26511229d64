"""State pytree tests (reference ``tests/unit/test_state.py``)."""

import jax
import jax.numpy as jnp
import numpy as np

from emcee_tpu import State
from emcee_tpu.state import as_state


def test_fields_and_properties():
    coords = jnp.zeros((8, 3))
    st = State(coords=coords, log_prob=jnp.zeros(8))
    assert st.nwalkers == 8
    assert st.ndim == 3
    assert st.blobs is None


def test_as_state_from_array():
    coords = np.ones((4, 2))
    st = as_state(coords)
    assert isinstance(st, State)
    assert st.coords.shape == (4, 2)
    assert st.log_prob is None


def test_as_state_passthrough():
    st = State(coords=jnp.zeros((4, 2)), log_prob=jnp.zeros(4))
    assert as_state(st) is st


def test_state_is_pytree():
    st = State(
        coords=jnp.zeros((4, 2)),
        log_prob=jnp.zeros(4),
        random_state=jax.random.key(0),
        blobs=jnp.ones(4),
    )
    leaves = jax.tree_util.tree_leaves(st)
    assert len(leaves) == 4
    doubled = jax.tree_util.tree_map(lambda x: x, st)
    assert isinstance(doubled, State)


def test_replace_is_functional():
    st = State(coords=jnp.zeros((4, 2)))
    st2 = st._replace(coords=jnp.ones((4, 2)))
    assert float(st.coords.sum()) == 0.0
    assert float(st2.coords.sum()) == 8.0


def test_legacy_unpack_no_blobs():
    """Reference parity (``state.py:47-75``): a blob-less state unpacks
    as the tutorial-idiom 3-tuple ``coords, log_prob, random_state``."""
    st = State(
        coords=jnp.zeros((4, 2)),
        log_prob=jnp.zeros(4),
        random_state=jax.random.key(0),
    )
    assert len(st) == 3
    coords, log_prob, rstate = st
    assert coords.shape == (4, 2)
    assert log_prob.shape == (4,)
    assert rstate is st.random_state
    # __getitem__ parity: index 3 invalid without blobs; -1 wraps to
    # random_state.
    assert st[2] is st.random_state
    assert st[-1] is st.random_state
    import pytest

    with pytest.raises(IndexError):
        st[3]


def test_legacy_unpack_with_blobs():
    st = State(
        coords=jnp.zeros((4, 2)),
        log_prob=jnp.zeros(4),
        random_state=jax.random.key(0),
        blobs=jnp.ones(4),
    )
    assert len(st) == 4
    coords, log_prob, rstate, blobs = st
    assert blobs is st.blobs
    assert st[-1] is st.blobs
    assert st[3] is st.blobs


def test_legacy_unpack_keeps_pytree_and_replace():
    """The unpack shim must not leak into pytree flattening, scan
    carries, ``_replace``, or pickling."""
    import pickle

    st = State(coords=jnp.zeros((4, 2)), log_prob=jnp.zeros(4))
    leaves, treedef = jax.tree_util.tree_flatten(st)
    st2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert isinstance(st2, State) and st2.blobs is None
    out, _ = jax.lax.scan(lambda c, _: (c, None), st, None, length=2)
    assert out.coords.shape == (4, 2)
    st3 = jax.jit(lambda s: s._replace(coords=s.coords + 1))(st)
    assert float(st3.coords[0, 0]) == 1.0
    rt = pickle.loads(pickle.dumps(jax.device_get(st)))
    assert rt.blobs is None and rt.log_prob is not None
    # Field (= positional ctor) order matches the reference State ctor.
    assert list(st._asdict()) == ["coords", "log_prob", "blobs",
                                  "random_state"]


def test_reference_ctor_order_and_copy():
    """Positional-constructor parity with the reference
    (``state.py:30-45``): ``State(coords, log_prob, blobs,
    random_state)``, plus the copy-constructor form."""
    rng = np.random.default_rng(0)
    coords = rng.normal(size=(8, 2))
    lp = rng.normal(size=8)
    blobs = rng.normal(size=8)
    key = jax.random.key(0)
    st = State(coords, lp, blobs, key)
    assert st.blobs is blobs
    assert st.random_state is key
    st2 = State(st)
    assert st2.coords is st.coords and st2.blobs is blobs
    st3 = State(st, copy=True)
    assert st3.coords is not st.coords
    np.testing.assert_allclose(st3.coords, st.coords)
