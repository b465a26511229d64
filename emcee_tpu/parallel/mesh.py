"""Device-mesh helpers.

The reference's parallelism is a duck-typed ``pool.map`` over per-walker
log-prob calls (``/root/reference/src/emcee/ensemble.py:486-496``) plus MPI
delegated to schwimmbad.  Here, parallelism is a ``jax.sharding.Mesh``:
walkers shard over one axis (and temperatures over another for parallel
tempering); collectives ride ICI/DCN automatically.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["walker_mesh"]


def walker_mesh(
    n_devices: Optional[int] = None,
    axis_name: str = "walkers",
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a 1-D mesh over all (or ``n_devices``) local devices.

    Multi-host: call ``jax.distributed.initialize()`` first; this uses the
    global device list so the walker axis spans hosts (ICI within a slice,
    DCN across).
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))
