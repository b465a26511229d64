"""Reference ``tests/unit/test_sampler.py`` — sampler driver parity."""

import numpy as np

from _loader import load

globals().update(
    load(
        "emcee.tests.unit.test_sampler",
        param_skips={
            # float128 offsets beyond float64 resolution: XLA has no
            # extended-precision type; walkers_independent keeps
            # longdouble host-side, but the 0.1/eps_longdouble case
            # also needs longdouble *chain* arithmetic.
            "test_walkers_independent_randn_offset_longdouble": (
                lambda a: a.get("offset", 0) > 1e16,
                "np.longdouble offsets beyond float64: no XLA "
                "extended-precision type",
            ),
        },
    )
)
