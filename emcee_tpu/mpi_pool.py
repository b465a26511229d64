"""Import-path shim for reference compatibility.

The reference forked its MPIPool out to ``schwimmbad``
(``/root/reference/src/emcee/mpi_pool.py:4-16``) and keeps only this
redirecting stub.  Multi-node scaling here is not pool-shaped at all:
initialize ``jax.distributed`` and pass a ``mesh=`` (walkers shard over
all hosts' devices; see docs/parallel.md and
``emcee_tpu/parallel/multihost.py``).  If ``schwimmbad`` is installed
its MPIPool still works as the ``pool=`` of a host-callback likelihood.
"""

try:
    from schwimmbad import MPIPool
except ImportError:

    class MPIPool:
        def __init__(self, *args, **kwargs):
            raise ImportError(
                "MPIPool requires the 'schwimmbad' package. On TPU, "
                "prefer mesh-based multi-host scaling: call "
                "jax.distributed.initialize() and pass mesh= to the "
                "sampler (docs/parallel.md)"
            )


__all__ = ["MPIPool"]
