"""Reference ``tests/unit/test_state.py`` — State container parity."""

from _loader import load

globals().update(load("emcee.tests.unit.test_state"))
