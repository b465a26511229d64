"""Reference ``tests/unit/test_ensemble.py`` — named parameters and
scalar-like log-prob returns (runs on the host-fallback path: these
functions branch on parameter values)."""

from _loader import load

globals().update(load("emcee.tests.unit.test_ensemble"))

# The module defines TestCase classes, which dir()-based loading does
# not pick up — import them explicitly.
from emcee.tests.unit.test_ensemble import (  # noqa: E402,F401
    TestLnProbFn,
    TestNamedParameters,
    TestNP2ListOfDicts,
)
