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
