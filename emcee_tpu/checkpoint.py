"""Sharded state checkpoints via Orbax.

The HDF backends persist *chains* in emcee's schema (gathered to host,
process 0 writes).  For large multi-host runs, gathering every chunk can
dominate; this module checkpoints the live sampler *state* (a sharded
pytree) natively with Orbax — each host writes its own shards — giving
crash-resume without any gather.  Typical pattern::

    from emcee_tpu import checkpoint

    state = sampler.run_mcmc(state, 1000, store=False)
    checkpoint.save_state("/ckpt/run1", state)
    ...
    state = checkpoint.load_state("/ckpt/run1", like=state)
    sampler.run_mcmc(state, 1000, store=False)

PRNG keys are stored as raw key data (orbax does not serialize typed key
arrays) and re-wrapped on load.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np

__all__ = ["save_state", "load_state"]


def _is_key(x) -> bool:
    try:
        return jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key)
    except Exception:
        return False


def _strip_keys(tree):
    """Replace typed PRNG keys with their uint32 key data."""
    def go(x):
        if x is not None and _is_key(x):
            return {"__prng_key_data__": jax.random.key_data(x)}
        return x

    return jax.tree_util.tree_map(go, tree, is_leaf=_is_key)


def _restore_keys(tree):
    def is_marker(x):
        return isinstance(x, dict) and "__prng_key_data__" in x

    def go(x):
        if is_marker(x):
            return jax.random.wrap_key_data(
                np.asarray(x["__prng_key_data__"], dtype=np.uint32)
            )
        return x

    return jax.tree_util.tree_map(go, tree, is_leaf=is_marker)


def save_state(path: str, state: Any, force: bool = True) -> None:
    """Checkpoint a (possibly sharded) state pytree to ``path``."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, _strip_keys(state), force=force)


def load_state(path: str, like: Optional[Any] = None) -> Any:
    """Restore a state pytree saved with :func:`save_state`.

    Args:
        path: checkpoint directory.
        like: optional example pytree (e.g. the current state) whose
            shardings/structure guide the restore; required for restoring
            directly into a sharded layout.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if like is not None:
            restored = ckptr.restore(path, _strip_keys(like))
        else:
            restored = ckptr.restore(path)
    if like is not None:
        # Rebuild the original NamedTuple class structure (orbax returns
        # plain containers).
        flat = jax.tree_util.tree_leaves(restored)
        _, treedef = jax.tree_util.tree_flatten(_strip_keys(like))
        restored = jax.tree_util.tree_unflatten(treedef, flat)
    return _restore_keys(restored)
