"""emcee_tpu: a TPU-native ensemble MCMC framework.

A from-scratch JAX/XLA re-design with the capabilities of dfm/emcee (the
Goodman & Weare affine-invariant ensemble sampler family), built for TPU:
fused jitted chain steps, walker sharding over device meshes with ICI
collectives, and asynchronous host chain streaming.  Public surface
mirrors the reference
(``/root/reference/src/emcee/__init__.py:22-36``).
"""

from . import autocorr, backends, checkpoint, kernels, moves, utils
from .monitor import ConvergenceMonitor, run_until_converged
from .stats import summary, to_inference_data
from .ops.autocorr import AutocorrError
from .parallel.tempering import PTSampler
from .sampler import EnsembleSampler
from .state import State, walkers_independent

__version__ = "0.6.0"

__all__ = [
    "EnsembleSampler",
    "PTSampler",
    "State",
    "walkers_independent",
    "ConvergenceMonitor",
    "run_until_converged",
    "summary",
    "to_inference_data",
    "AutocorrError",
    "moves",
    "kernels",
    "checkpoint",
    "autocorr",
    "backends",
    "utils",
    "__version__",
]
