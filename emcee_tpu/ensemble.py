"""Import-path alias for reference compatibility.

The reference keeps the driver in ``emcee.ensemble``
(``/root/reference/src/emcee/ensemble.py:16``); here it lives in
``sampler.py``.  This alias keeps ``from emcee.ensemble import
EnsembleSampler``-style imports working after a package rename.
"""

from .sampler import EnsembleSampler
from .state import walkers_independent

__all__ = ["EnsembleSampler", "walkers_independent"]
