"""Reference ``tests/integration/test_de_snooker.py`` — statistical move checks."""

from _loader import load

globals().update(load("emcee.tests.integration.test_de_snooker"))
