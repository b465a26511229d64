"""Reference ``tests/unit/test_autocorr.py`` — integrated_time parity."""

from _loader import load

globals().update(load("emcee.tests.unit.test_autocorr"))
