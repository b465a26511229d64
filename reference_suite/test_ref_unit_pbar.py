"""Reference ``tests/unit/test_pbar.py`` — progress-bar selection."""

from _loader import load

globals().update(load("emcee.tests.unit.test_pbar"))
