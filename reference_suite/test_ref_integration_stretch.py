"""Reference ``tests/integration/test_stretch.py`` — statistical move checks."""

from _loader import load

globals().update(
    load(
        "emcee.tests.integration.test_stretch",
        skips={
            # 32 walkers / nsplits=5: uneven red-blue splits need
            # data-dependent group sizes, which fixed-shape jit cannot
            # express; nsplits must divide nwalkers
            # (docs/migrating.md).  Divisible nsplits>2 are covered by
            # tests/unit/test_moves_unit.py.
            "test_nsplits_stretch": (
                "nsplits must divide nwalkers under fixed-shape jit "
                "(docs/migrating.md)"
            ),
        },
    )
)
