"""Reference ``tests/unit/test_stretch.py`` — imperative propose() API.

Skipped as a module-level divergence: the reference drives
``move.propose(model, state)`` imperatively against a global
``np.random`` stream; our moves are functional (``propose(key, state,
model, carry)``) because the chain advances inside ``jax.lax.scan``.
The behavior under test — the red-blue RuntimeError guard for
``nwalkers < 2*ndim`` and ``live_dangerously`` — is covered natively in
``tests/unit/test_moves_unit.py``.
"""

import pytest

from _loader import load

globals().update(
    load(
        "emcee.tests.unit.test_stretch",
        skips={
            "test_live_dangerously": (
                "imperative Move.propose(model, state) with a global "
                "numpy RNG has no functional-JAX equivalent; guard "
                "covered by tests/unit/test_moves_unit.py"
            ),
        },
    )
)
