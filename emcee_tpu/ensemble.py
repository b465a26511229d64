"""Import-path alias for reference compatibility.

The reference keeps the driver in ``emcee.ensemble``
(``/root/reference/src/emcee/ensemble.py:16``); here it lives in
``sampler.py``.  This alias keeps ``from emcee.ensemble import
EnsembleSampler``-style imports working after a package rename.
"""

from .sampler import EnsembleSampler
from .state import walkers_independent

__all__ = [
    "EnsembleSampler",
    "walkers_independent",
    "ndarray_to_list_of_dicts",
]


def ndarray_to_list_of_dicts(x, key_map):
    """Rows of ``x`` as name->value dicts per the ``key_map``
    (reference ``ensemble.py:685-700``) — the named-parameter calling
    convention helper; exposed here for import-path parity."""
    return [
        {key: row[val] for key, val in key_map.items()} for row in x
    ]
