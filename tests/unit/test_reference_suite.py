"""Conformance gate: the REFERENCE emcee test suite must pass.

Runs ``reference_suite/`` (the reference's own test modules from
``/root/reference/src/emcee/tests``, uncopied, with ``emcee`` aliased to
``emcee_tpu``) in a subprocess — it enables float64 globally, which this
process must not inherit — and pins the pass/skip counts, so any API
regression against the reference surface fails the main suite.

Skip inventory (every skip is justified in ``reference_suite/`` and
docs/migrating.md):

* 4  ``test_reload`` — ``np.random.set_state(backend.random_state)``:
     the sampler RNG is a JAX key stream, not MT19937.
* 7  ``test_blob_shape`` params — traced ragged numeric tuples keep the
     native pytree layout; object blobs cannot live in the HBM
     DeviceBackend (our extra test backend).
* 4  longdouble sampling arithmetic — XLA has no float80/128 (storage
     IS covered: ``test_longdouble_preserved`` passes on host backends).
* 2  ``nsplits=5`` with 32 walkers — uneven red-blue splits need
     data-dependent group sizes, which fixed-shape jit cannot express.
* 1  ``test_live_dangerously`` — imperative ``propose(model, state)``
     with global numpy RNG has no functional equivalent.
* 1  DeviceBackend longdouble param of ``test_longdouble_preserved``.
"""

import re
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[2]

EXPECTED_PASSED = 143
EXPECTED_SKIPPED = 19


@pytest.mark.slow
def test_reference_emcee_suite_passes():
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "reference_suite/", "-q", "-p",
         "no:cacheprovider"],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=3000,
    )
    tail = "\n".join(proc.stdout.splitlines()[-25:])
    assert proc.returncode == 0, (
        f"reference suite failed (rc={proc.returncode}):\n{tail}\n"
        f"{proc.stderr[-2000:]}"
    )
    m = re.search(r"(\d+) passed", proc.stdout)
    ms = re.search(r"(\d+) skipped", proc.stdout)
    passed = int(m.group(1)) if m else 0
    skipped = int(ms.group(1)) if ms else 0
    assert passed >= EXPECTED_PASSED, (
        f"reference-suite passes regressed: {passed} < "
        f"{EXPECTED_PASSED}\n{tail}"
    )
    assert skipped <= EXPECTED_SKIPPED, (
        f"reference-suite skips grew: {skipped} > {EXPECTED_SKIPPED} — "
        f"every new skip needs a justification\n{tail}"
    )
