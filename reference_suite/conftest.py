"""Conformance gate: run the REFERENCE emcee test suite against emcee_tpu.

The strongest drop-in oracle available: the reference's own tests
(``/root/reference/src/emcee/tests``) collected directly from the
read-only checkout (never copied) and executed with ``emcee`` aliased to
``emcee_tpu``.  Divergences that cannot hold under the JAX execution
model are skipped EXPLICITLY, each with a one-line justification —
see ``_loader.py`` SKIPS / PARAM_SKIPS and docs/migrating.md.

Run as its own pytest invocation (it enables float64 globally, which the
main suite must not inherit):

    python -m pytest reference_suite/ -q

The main suite pins the expected pass/skip counts via
``tests/unit/test_reference_suite.py`` (subprocess wrapper).
"""

import os
import sys
import types

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
# The reference asserts float64 log-probs and compares float64 chains.
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import emcee_tpu
import emcee_tpu.autocorr
import emcee_tpu.backends
import emcee_tpu.backends.hdf
import emcee_tpu.ensemble
import emcee_tpu.model
import emcee_tpu.moves
import emcee_tpu.pbar
import emcee_tpu.state
import emcee_tpu.utils

REFERENCE_TESTS = "/root/reference/src/emcee/tests"

# Alias the package and every submodule the reference tests import.
sys.modules["emcee"] = emcee_tpu
for sub in (
    "autocorr",
    "backends",
    "backends.hdf",
    "ensemble",
    "model",
    "moves",
    "pbar",
    "state",
    "utils",
):
    sys.modules[f"emcee.{sub}"] = sys.modules[f"emcee_tpu.{sub}"]

# Namespace packages pointing INTO the reference checkout so its test
# modules (and their relative imports) load in place, uncopied.
for pkg, path in (
    ("emcee.tests", REFERENCE_TESTS),
    ("emcee.tests.unit", REFERENCE_TESTS + "/unit"),
    ("emcee.tests.integration", REFERENCE_TESTS + "/integration"),
):
    mod = types.ModuleType(pkg)
    mod.__path__ = [path]
    sys.modules[pkg] = mod
