"""Load reference test modules and re-export their test functions.

Skip lists live here so the justification for every divergence is in
one greppable place (mirrored in docs/migrating.md).
"""

import functools
import importlib

import numpy as np
import pytest


def load(module_name, skips=None, param_skips=None):
    """Import a reference test module (via the ``emcee.tests`` alias
    package) and return its ``test_*`` functions, with the listed
    skips applied."""
    mod = importlib.import_module(module_name)
    out = {}
    for attr in dir(mod):
        if not attr.startswith("test_"):
            continue
        fn = getattr(mod, attr)
        if skips and attr in skips:
            fn = pytest.mark.skip(reason=skips[attr])(fn)
        elif param_skips and attr in param_skips:
            fn = _skip_params(fn, *param_skips[attr])
        out[attr] = fn
    return out


def _skip_params(fn, predicate, reason):
    """Skip only the parametrizations matching ``predicate`` (called
    with the test's call kwargs)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        import inspect

        bound = inspect.signature(fn).bind_partial(*args, **kwargs)
        if predicate(bound.arguments):
            pytest.skip(reason)
        return fn(*args, **kwargs)

    return wrapper


def is_device_backend(cls):
    import emcee_tpu.backends as b

    return isinstance(cls, type) and issubclass(cls, b.DeviceBackend)
