"""Reference ``tests/integration/test_stretch.py`` — statistical move checks."""

from _loader import load

globals().update(load("emcee.tests.integration.test_stretch"))
