"""Smoke tests: every shipped example runs end-to-end (at reduced size).

The reference's tutorials are executable documentation; these tests keep
``examples/`` from bit-rotting by importing each script and driving its
``main()`` with the module-level size knobs shrunk to CI scale.
"""

import importlib.util
import os
import sys

import pytest

_EXAMPLES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "examples",
)


def _load(name):
    path = os.path.join(_EXAMPLES, name)
    spec = importlib.util.spec_from_file_location(
        f"_example_{name.removesuffix('.py')}", path
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_example_quickstart():
    mod = _load("01_quickstart_gaussian.py")
    mod.nsteps = 200
    mod.main()


def test_example_line_fit():
    mod = _load("02_line_fit.py")
    mod.nsteps = 300
    mod.main()


def test_example_correlated_100d():
    mod = _load("03_correlated_100d.py")
    mod.nwalkers = 512
    mod.nsteps = 20
    mod.main()


def test_example_tempered():
    mod = _load("04_tempered_multimodal.py")
    mod.ntemps = 4
    mod.nsteps = 60
    mod.main()


@pytest.mark.skipif(
    len(__import__("jax").devices()) < 2, reason="needs multiple devices"
)
def test_example_hierarchical_sharded():
    mod = _load("05_hierarchical_sharded.py")
    mod.nsteps = 3
    mod.main()


def test_example_device_resident():
    mod = _load("06_device_resident.py")
    mod.check_every = 100
    mod.max_rounds = 3
    mod.main()


def test_example_gradient_moves():
    mod = _load("07_gradient_moves.py")
    mod.nsteps = 400
    mod.main()


def test_example_multimodal_dime():
    mod = _load("08_multimodal_dime.py")
    mod.nsteps = 600
    mod.nwalkers = 64
    occ = mod.run(mod.moves.DIMEMove(aimh_prob=0.2), "DIME")
    # The unseen middle mode gets found and populated.
    assert occ[1] > 0.15


def test_example_production_pattern():
    mod = _load("09_production_pattern.py")
    mod.nwalkers = 64
    mod.burn_steps = 100
    mod.max_steps = 4000
    mod.check_every = 500
    report = mod.main()
    assert report is not None


def test_example_blackbox_pool():
    mod = _load("10_blackbox_pool.py")
    mod.nsteps = 20
    mod.main()


def test_example_dropin_emcee_code():
    mod = _load("11_dropin_emcee_code.py")
    mod.nsteps = 60
    s = mod.main()
    assert s.get_blobs().shape[0] == 70  # 60 + 10 resumed
