"""Multi-host placement helpers.

The reference delegates multi-node execution to MPI pools
(``/root/reference/src/emcee/mpi_pool.py:4-14``); here the equivalent is
``jax.distributed`` with arrays sharded over a global mesh.  One wrinkle:
``jax.device_put`` refuses shardings that span non-addressable devices, so
placing the (host-replicated) initial state onto a multi-process mesh goes
through ``jax.make_array_from_callback``, which asks each process only for
the shards its own devices hold.
"""

from __future__ import annotations

import jax
import numpy as np

__all__ = ["device_put_global", "tree_put"]


def device_put_global(x, sharding):
    """Place a host value onto ``sharding`` even when it spans processes.

    ``x`` must hold the full *global* value (identical on every process).
    PRNG key arrays are unwrapped to their uint32 data, placed, and
    re-wrapped under jit (extended dtypes cannot ride make_array_from_
    callback directly).
    """
    if x is None:
        return None
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        # Already a live global array (a resumed previous state): it
        # cannot be fetched host-side, and re-placement is only needed
        # if the sharding changed — which for a state produced by this
        # same program it has not.
        if x.sharding.is_equivalent_to(sharding, x.ndim):
            return x
        raise NotImplementedError(
            "cannot re-shard a multi-process global array "
            f"({x.sharding} -> {sharding}); resume with the sharding "
            "it was produced under"
        )
    if isinstance(x, jax.Array) and jax.dtypes.issubdtype(
        x.dtype, jax.dtypes.prng_key
    ):
        data = np.asarray(jax.random.key_data(x))
        g = jax.make_array_from_callback(
            data.shape, sharding, lambda idx: data[idx]
        )
        return jax.jit(jax.random.wrap_key_data)(g)
    arr = np.asarray(jax.device_get(x))
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx]
    )


def tree_put(tree, shardings):
    """``device_put_global`` over matching pytrees (None leaves pass)."""
    return jax.tree_util.tree_map(
        device_put_global,
        tree,
        shardings,
        is_leaf=lambda x: x is None,
    )
