"""Reference ``tests/integration/test_kde.py`` — statistical move checks."""

from _loader import load

globals().update(
    load(
        "emcee.tests.integration.test_kde",
        skips={
            "test_nsplits_kde": (
                "nsplits must divide nwalkers under fixed-shape jit "
                "(docs/migrating.md)"
            ),
        },
    )
)
