"""Import-path shim for reference compatibility.

The reference's ``interruptible_pool`` is itself a one-line alias for
the stdlib pool (``/root/reference/src/emcee/interruptible_pool.py:4``
— "The standard library now has an interruptible pool").  Kept here so
``from emcee.interruptible_pool import InterruptiblePool``-style code
ports unchanged; the returned pool works directly as the ``pool=``
argument of the host-callback path (docs/parallel.md).  On-device
interrupt safety is handled differently — chunk-granular anchors +
deferred SIGINT (``utils.defer_interrupts``) make ``run_mcmc`` itself
interruptible and resumable.
"""

from multiprocessing.pool import Pool as InterruptiblePool

__all__ = ["InterruptiblePool"]
