"""Reference ``tests/unit/test_backends.py`` — storage contract parity.

Note get_test_backends() here returns OUR backend set, which includes
the beyond-reference DeviceBackend — the reference tests run against it
too, except where its HBM storage genuinely cannot hold the data.
"""

import numpy as np

from _loader import is_device_backend, load

globals().update(
    load(
        "emcee.tests.unit.test_backends",
        skips={
            # The one true RNG-representation divergence: our stored
            # random_state is JAX PRNG key data (indexable uint32
            # words), not an MT19937 tuple, so np.random.set_state()
            # on it cannot work.  Reload equality itself is covered by
            # tests/unit/test_backends.py::test_hdf_resume and the
            # emcee-interop round-trip tests.
            "test_reload": (
                "np.random.set_state(backend.random_state): sampler "
                "RNG is a JAX PRNG key stream, not MT19937 "
                "(docs/migrating.md)"
            ),
        },
        param_skips={
            "test_longdouble_preserved": (
                lambda a: is_device_backend(a.get("backend")),
                "DeviceBackend stores the chain in HBM; XLA has no "
                "longdouble",
            ),
        },
    )
)
