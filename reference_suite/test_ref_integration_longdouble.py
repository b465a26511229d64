"""Reference ``tests/integration/test_longdouble.py``."""

from _loader import is_device_backend, load
from emcee_tpu.backends.hdf import does_hdf5_support_longdouble  # noqa

globals().update(
    load(
        "emcee.tests.integration.test_longdouble",
        skips={
            # The log-prob asserts x.dtype == np.longdouble inside the
            # evaluation; XLA has no extended-precision float, so the
            # sampling arithmetic is float64 on every path.
            "test_longdouble_actually_needed": (
                "XLA has no longdouble: sampling arithmetic is "
                "float64 (docs/migrating.md); storage-side longdouble "
                "is covered by test_ref_unit_backends.py::"
                "test_longdouble_preserved"
            ),
        },
    )
)
